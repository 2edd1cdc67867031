"""Global ranking: ROW_NUMBER sort-mode parity on a total order,
RANK/DENSE_RANK/PERCENT_RANK map-mode tie semantics, mode agreement on
a total order, partition invariance, guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.stages.global_rank import (global_ranks_by_key,
                                             global_row_number)

SF = "/root/testdata/sf0.001"


def test_row_number_duckdb_parity_orders(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    want = con.execute(
        "SELECT o_orderkey, ROW_NUMBER() OVER "
        "(ORDER BY o_totalprice, o_orderkey) AS row_number "
        "FROM orders ORDER BY o_orderkey").fetchdf()
    ds = rd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    got = (global_row_number(ds, ["o_totalprice", "o_orderkey"])
           .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    assert got["row_number"].tolist() == want["row_number"].tolist()


def test_row_number_descending(ray_session):
    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                       "v": np.random.default_rng(3).permutation(100)})
    got = (global_row_number(rd.from_pandas(df, override_num_blocks=7),
                             ["v", "k"], descending=[True, False])
           .to_pandas())
    want = duckdb.sql(
        "SELECT k, ROW_NUMBER() OVER (ORDER BY v DESC, k) rn FROM df"
    ).fetchdf().set_index("k")["rn"]
    assert (got.set_index("k")["row_number"].sort_index()
            == want.sort_index()).all()


def test_ranks_by_key_tie_semantics(ray_session):
    rng = np.random.default_rng(17)
    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64),
                       "s": rng.choice(["a", "b", "c", "d"], 500)})
    got = (global_ranks_by_key(rd.from_pandas(df, override_num_blocks=5),
                               ["s"]).to_pandas()
           .sort_values("id").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT id, RANK() OVER (ORDER BY s) r, "
        "DENSE_RANK() OVER (ORDER BY s) d, "
        "PERCENT_RANK() OVER (ORDER BY s) p FROM df ORDER BY id"
    ).fetchdf()
    assert got["rank"].tolist() == want["r"].tolist()
    assert got["dense_rank"].tolist() == want["d"].tolist()
    np.testing.assert_allclose(got["percent_rank"].to_numpy(),
                               want["p"].to_numpy(), rtol=1e-12)


def test_mode_agreement_on_total_order(ray_session):
    # under a total order rank == dense_rank == row_number
    df = pd.DataFrame({"k": np.random.default_rng(9).permutation(300)})
    ds = rd.from_pandas(df, override_num_blocks=6)
    a = (global_row_number(ds, ["k"]).to_pandas()
         .sort_values("k").reset_index(drop=True))
    b = (global_ranks_by_key(ds, ["k"]).to_pandas()
         .sort_values("k").reset_index(drop=True))
    assert a["row_number"].tolist() == b["rank"].tolist()
    assert b["rank"].tolist() == b["dense_rank"].tolist()


def test_partition_invariance(ray_session):
    df = pd.DataFrame({"v": np.random.default_rng(5).permutation(1000),
                       "t": np.arange(1000, dtype=np.int64)})
    outs = []
    for blocks in (1, 13):
        o = (global_row_number(
            rd.from_pandas(df, override_num_blocks=blocks), ["v", "t"])
            .to_pandas().sort_values("t").reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_descending_string_key_rejected(ray_session):
    df = pd.DataFrame({"s": ["a", "b"]})
    with pytest.raises(ValueError):
        global_row_number(rd.from_pandas(df), ["s"],
                          descending=True).to_pandas()
