"""DuckDB-oracle parity for every queries()/oracle_sql() pair — the same
comparison the driver runs (row count + schema-name + order-insensitive
values), executed locally at sf0.001. Mirrors the reference's dual-path
consistency tests (cerberus/tests/test_invoices.py:33-51,107-131)."""

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df


def queries_and_oracles():
    import __ray_entry__ as e

    # the full oracle map includes _GATED_OVERFLOW entries whose query
    # lives in extra_queries() (50-slot registry budget); the DRIVER
    # surface (oracle_sql) must stay a subset of the registered queries
    q = e.queries() | e.extra_queries()
    o = e.all_oracle_sql()
    assert set(e.oracle_sql()) <= set(e.queries())
    assert set(o) <= set(q), "oracle keys must have a runnable query"
    return q, o


def pairs():
    import __ray_entry__ as e

    return sorted(e.all_oracle_sql())


@pytest.mark.parametrize("name", pairs())
def test_query_matches_oracle(ray_session, con, name):
    q, o = queries_and_oracles()
    mine = normalize(to_df(q[name](SF_DIR)))
    theirs = normalize(con.execute(o[name]).df())
    assert list(mine.columns) == list(theirs.columns), (
        f"{name}: columns {list(mine.columns)} != {list(theirs.columns)}")
    assert len(mine) == len(theirs), f"{name}: {len(mine)} vs {len(theirs)} rows"
    if len(mine) == 0:
        return
    for c in mine.columns:
        a, b = mine[c], theirs[c]
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            diffs = [
                (x, y) for x, y in zip(a, b)
                if not (x == y or (isinstance(x, float) and isinstance(y, float)
                                   and (math.isnan(x) and math.isnan(y)
                                        or abs(x - y) < 1e-6)))]
            assert not diffs, f"{name}.{c}: {diffs[:5]}"
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), f"{name}.{c}"


def test_registry_shape_and_extras_run(ray_session):
    """Driver-contract shape: exactly 50 registered queries with every
    oracle-gated entry first (the driver records only the first 50 rows);
    the overflow operators stay callable through extra_queries()."""
    import __ray_entry__ as e

    q, o, x = e.queries(), e.oracle_sql(), e.extra_queries()
    assert len(q) == 50
    keys = list(q)
    n_oracle = len(o)
    assert all(k in o for k in keys[:n_oracle])
    assert not (set(q) & set(x))
    for name, fn in x.items():
        r = to_df(fn(SF_DIR))
        assert len(r) >= 0, name


def test_extra_queries_deterministic(ray_session):
    """Every overflow operator returns identical results across two runs
    in one session (rows-only surfaces must be deterministic for the
    driver's repeat checks)."""
    import __ray_entry__ as e

    for name, fn in e.extra_queries().items():
        a, b = to_df(fn(SF_DIR)), to_df(fn(SF_DIR))
        pd.testing.assert_frame_equal(a, b), name
