"""Per-group approximate quantiles (grouped t-digest): rank accuracy vs
exact quantiles on the real events table, block-layout invariance of the
estimate quality, and NaN exemption."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cerberus_ray.sources.io import read_table
from cerberus_ray.stages.groupagg import approx_quantiles_by_group

SF = "/root/testdata/sf0.001"


def exact_q(pdf: pd.DataFrame, gcol: str, vcol: str, qs):
    out = {}
    for g, sub in pdf.groupby(gcol):
        out[str(g)] = np.quantile(sub[vcol].dropna().to_numpy(), qs)
    return out


def rank_error(pdf, gcol, vcol, g, est) -> float:
    """|cdf(est) - q| measured on the exact per-group distribution."""
    vals = np.sort(pdf.loc[pdf[gcol].astype(str) == g, vcol]
                   .dropna().to_numpy())
    return np.searchsorted(vals, est, side="right") / len(vals)


def test_accuracy_vs_exact_events(ray_session):
    ds = read_table(f"{SF}/events.parquet",
                    columns=["event_type", "value"]).materialize()
    pdf = ds.to_pandas()
    qs = (0.25, 0.5, 0.75)
    got = approx_quantiles_by_group(ds, "event_type", "value", qs=qs)
    assert list(got.columns) == ["event_type", "q25", "q50", "q75"]
    for _, row in got.iterrows():
        for q, col in zip(qs, ["q25", "q50", "q75"]):
            r = rank_error(pdf, "event_type", "value",
                           row["event_type"], row[col])
            assert abs(r - q) < 0.02, (row["event_type"], q, r)


def test_layout_invariance_and_nan(ray_session):
    rng = np.random.default_rng(5)
    n = 6000
    pdf = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], n // 3),
        "v": np.concatenate([rng.normal(0, 1, n // 3),
                             rng.exponential(2, n // 3),
                             rng.uniform(-5, 5, n // 3)])})
    # plant NaNs: they must not poison the digests
    pdf.loc[pdf.sample(frac=0.05, random_state=1).index, "v"] = np.nan
    a = approx_quantiles_by_group(
        rd.from_arrow(pa.Table.from_pandas(pdf)).repartition(1)
        .materialize(), "g", "v")
    b = approx_quantiles_by_group(
        rd.from_arrow(pa.Table.from_pandas(
            pdf.sample(frac=1, random_state=2))).repartition(9)
        .materialize(), "g", "v")
    ex = exact_q(pdf, "g", "v", [0.25, 0.5, 0.75])
    for frame in (a, b):
        assert not frame.isna().any().any()
        for _, row in frame.iterrows():
            want = ex[row["g"]]
            for col, w in zip(["q25", "q50", "q75"], want):
                spread = ex[row["g"]][2] - ex[row["g"]][0]
                assert abs(row[col] - w) < 0.05 * max(spread, 1.0)
