"""Full-outer native join: DuckDB parity over disjoint-domain keys —
completes the exercised join-type matrix (inner/left/anti/semi/asof/
interval/range/fuzzy/bucketed/broadcast already covered elsewhere)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd


def test_full_outer_duckdb_parity(ray_session):
    rng = np.random.default_rng(23)
    lhs = pd.DataFrame({"k": rng.choice(np.arange(0, 30), 40),
                         "a": np.arange(40, dtype=np.int64)})
    rhs = pd.DataFrame({"k": rng.choice(np.arange(20, 50), 40),
                          "b": np.arange(40, dtype=np.int64)})
    ld = rd.from_pandas(lhs, override_num_blocks=3)
    r = rd.from_pandas(rhs.rename(columns={"k": "rk"}),
                       override_num_blocks=4)
    got = (ld.join(r, join_type="full_outer", num_partitions=4,
                   on=("k",), right_on=("rk",))
           .to_pandas())
    want = duckdb.sql(
        "SELECT COALESCE(l.k, r.k) AS k, l.a, r.b "
        "FROM lhs l FULL OUTER JOIN rhs r ON l.k = r.k").fetchdf()

    def canon(df, kcol):
        return sorted(
            ("∅" if pd.isna(row[kcol]) else int(row[kcol]),
             "∅" if pd.isna(row["a"]) else int(row["a"]),
             "∅" if pd.isna(row["b"]) else int(row["b"]))
            for _, row in df.iterrows())

    # Ray coalesces the key pair into the left column name
    assert canon(got, "k") == canon(want, "k")
    # row-count identity: inner + left-only + right-only
    n_inner = duckdb.sql(
        "SELECT COUNT(*) FROM lhs l JOIN rhs r ON l.k = r.k"
    ).fetchone()[0]
    assert len(got) >= max(len(lhs), len(rhs)) and len(got) == len(want)
    assert (got["a"].notna() & got["b"].notna()).sum() == n_inner
