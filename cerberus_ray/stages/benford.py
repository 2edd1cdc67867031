"""Benford's-law first-digit audit of a numeric column — a classic
data-quality / fraud screen (public formula: P(d) = log10(1 + 1/d)).

One map-side pass: each block reduces to a 9-bin digit histogram
(vectorized numpy: d = ⌊|x| / 10^⌊log10|x|⌋⌋ over finite non-zero
values), the driver sums 9-long partials — no shuffle, traffic is 9
ints per block. Reports the observed distribution plus the two standard
deviation statistics: Pearson χ² against the Benford expectation and
MAD (mean absolute deviation of digit proportions, Nigrini's
conformity measure).

The digit extraction is pure float arithmetic so a DuckDB oracle can
mirror it exactly (FLOOR(ABS(x)/POWER(10, FLOOR(LOG10(ABS(x)))))):
tests/test_benford.py. Fits the validation rule-set as a distribution
check alongside `stages/drift.py`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["benford_profile", "BENFORD_P"]

#: P(first digit = d) = log10(1 + 1/d), d = 1..9
BENFORD_P = np.log10(1.0 + 1.0 / np.arange(1, 10))


def benford_profile(ds, col: str, *, round_digits: int = 6) -> pd.DataFrame:
    """→ frame of 9 rows (digit, n, p_obs, p_exp, chi2, mad); ``chi2``
    and ``mad`` are whole-column statistics repeated on every row (the
    frame is the per-digit evidence for them). Zero / NULL / non-finite
    values are excluded (they have no first significant digit)."""

    def partial(b: pa.Table) -> pa.Table:
        x = np.abs(b[col].to_numpy(zero_copy_only=False)
                   .astype(np.float64))
        x = x[np.isfinite(x) & (x > 0)]
        if len(x):
            d = np.floor(x / 10.0 ** np.floor(np.log10(x)))
            counts = np.bincount(d.astype(np.int64), minlength=10)[1:10]
        else:
            counts = np.zeros(9, dtype=np.int64)
        return pa.Table.from_pydict({
            "digit": pa.array(np.arange(1, 10), pa.int64()),
            "n": pa.array(counts, pa.int64())})

    pdf = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
    n = (pdf.groupby("digit")["n"].sum()
         .reindex(np.arange(1, 10), fill_value=0)
         .to_numpy(dtype=np.int64))
    total = int(n.sum())
    if total:
        p_obs = n / total
        chi2 = float((((n - total * BENFORD_P) ** 2)
                      / (total * BENFORD_P)).sum())
        mad = float(np.abs(p_obs - BENFORD_P).mean())
    else:
        p_obs = np.full(9, np.nan)
        chi2 = mad = float("nan")
    return pd.DataFrame({
        "digit": np.arange(1, 10, dtype=np.int64),
        "n": n,
        "p_obs": np.round(p_obs, round_digits),
        "p_exp": np.round(BENFORD_P, round_digits),
        "chi2": round(chi2, round_digits),
        "mad": round(mad, round_digits)})
