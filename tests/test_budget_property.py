"""Property test for the token-budget prefix cut: for any scores
(including ties), token counts (including zeros) and budget, the
selected set must equal the SQL ROWS-window prefix — driver mode every
example, sort mode spot-checked (it is exercised densely in
test_budget's 1-row-block sweep)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cerberus_ray.pipelines.budget import select_token_budget

SQL = """
SELECT doc_id FROM (
  SELECT doc_id,
         SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM t) WHERE cum <= {budget}
"""


@st.composite
def cases(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    # few distinct scores -> dense ties; zeros allowed in tokens
    scores = draw(st.lists(st.sampled_from([0.0, 1.0, 2.5, 7.0]),
                           min_size=n, max_size=n))
    toks = draw(st.lists(st.integers(min_value=0, max_value=40),
                         min_size=n, max_size=n))
    frac = draw(st.floats(min_value=0.0, max_value=1.2))
    nblocks = draw(st.integers(min_value=1, max_value=5))
    df = pd.DataFrame({"doc_id": [f"d{i:03d}" for i in range(n)],
                       "score": scores, "n_tokens": toks})
    return df, int(sum(toks) * frac), nblocks


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(c=cases())
def test_budget_prefix_matches_sql_window(ray_session, c):
    df, budget, nblocks = c
    con = duckdb.connect()
    con.register("t", df)
    exp = set(con.execute(SQL.format(budget=budget)).df()["doc_id"])
    ds = rd.from_pandas(df).repartition(nblocks).materialize()
    sel = select_token_budget(ds, budget, score_col="score",
                              mode="driver").to_pandas()
    got = set(sel["doc_id"]) if len(sel) else set()
    assert got == exp
