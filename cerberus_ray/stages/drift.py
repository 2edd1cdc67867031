"""Distribution-drift checks (north_rule ST6).

Per-column profiles are mergeable sketches built per block and reduced in
a tiny merge (sketch rows, not data rows, cross the wire):

- numeric columns → t-digest (+ exact count/mean moments)
- categorical columns → capped frequency tables

Profiles compare run-vs-baseline (or partition-vs-global) via:
- KS distance: max |CDF_a - CDF_b| on a merged quantile grid
- PSI (population stability index) over baseline-decile buckets /
  category frequencies, with standard 0.1/0.2 thresholds
- new-category detection (a value unseen in the baseline)

Reference grounding: the weekly report count/total deltas the CRM owner
eyeballs week-over-week (cerberus/reports.py:19-35) — generalized to
whole-distribution comparison. Drift findings are emitted as violation
rows (rule='drift-*', path=column) like every other rule.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa

from ..schema import VIOLATIONS
from ..state.tdigest import TDigest

_MAX_CATEGORIES = 1000


@dataclass
class NumericProfile:
    digest: TDigest
    count: int = 0
    total: float = 0.0
    total_sq: float = 0.0

    def merge(self, other: "NumericProfile") -> "NumericProfile":
        self.digest.merge(other.digest)
        self.count += other.count
        self.total += other.total
        self.total_sq += other.total_sq
        return self

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else float("nan")

    def to_dict(self) -> dict:
        return {"kind": "numeric", "count": self.count, "total": self.total,
                "total_sq": self.total_sq,
                "digest": self.digest.to_bytes().hex()}

    @classmethod
    def from_dict(cls, d: dict) -> "NumericProfile":
        return cls(digest=TDigest.from_bytes(bytes.fromhex(d["digest"])),
                   count=d["count"], total=d["total"], total_sq=d["total_sq"])


@dataclass
class CategoricalProfile:
    counts: Dict[str, int] = field(default_factory=dict)
    other: int = 0

    def merge(self, o: "CategoricalProfile") -> "CategoricalProfile":
        for k, v in o.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v
        self.other += o.other
        if len(self.counts) > _MAX_CATEGORIES:
            keep = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
            for k, v in keep[_MAX_CATEGORIES:]:
                self.other += v
                del self.counts[k]
        return self

    @property
    def total(self) -> int:
        return sum(self.counts.values()) + self.other

    def to_dict(self) -> dict:
        return {"kind": "categorical", "counts": self.counts, "other": self.other}

    @classmethod
    def from_dict(cls, d: dict) -> "CategoricalProfile":
        return cls(counts=dict(d["counts"]), other=d["other"])


@dataclass
class TableProfile:
    columns: Dict[str, object] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps({k: v.to_dict() for k, v in self.columns.items()},
                          sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "TableProfile":
        d = json.loads(s)
        cols = {}
        for k, v in d.items():
            cols[k] = (NumericProfile.from_dict(v) if v["kind"] == "numeric"
                       else CategoricalProfile.from_dict(v))
        return cls(columns=cols)


def _batch_profile(batch: pa.Table, numeric: Sequence[str],
                   categorical: Sequence[str], compression: float) -> pa.Table:
    rows = []
    for c in numeric:
        v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        td = TDigest(compression=compression)
        td.update(v)
        np_ = NumericProfile(digest=td, count=int(len(v)),
                             total=float(v.sum()),
                             total_sq=float((v ** 2).sum()))
        rows.append({"col": c, "payload": json.dumps(np_.to_dict())})
    for c in categorical:
        import pyarrow.compute as pc

        vc = batch.select([c]).group_by(c).aggregate([([], "count_all")])
        keys = vc[c].to_pylist()
        cnts = vc["count_all"].to_pylist()
        cp = CategoricalProfile(
            counts={str(k): int(n) for k, n in zip(keys, cnts) if k is not None})
        rows.append({"col": c, "payload": json.dumps(cp.to_dict())})
    return pa.Table.from_pylist(rows)


def profile_dataset(ds, *, numeric: Sequence[str] = (),
                    categorical: Sequence[str] = (),
                    compression: float = 200.0) -> TableProfile:
    """Distributed per-block sketching → driver merge of the tiny sketch
    rows ((#blocks × #cols) rows; each ≤ a few KB)."""
    parts = ds.map_batches(
        lambda b: _batch_profile(b, numeric, categorical, compression),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    prof = TableProfile()
    for _, row in parts.iterrows():
        d = json.loads(row["payload"])
        p = (NumericProfile.from_dict(d) if d["kind"] == "numeric"
             else CategoricalProfile.from_dict(d))
        if row["col"] in prof.columns:
            prof.columns[row["col"]].merge(p)
        else:
            prof.columns[row["col"]] = p
    return prof


# ---------------------------------------------------------------------------
# comparisons
# ---------------------------------------------------------------------------

def ks_distance(a: NumericProfile, b: NumericProfile, *, grid: int = 201) -> float:
    """Max CDF gap on the union quantile grid of both digests."""
    if a.count == 0 or b.count == 0:
        return float("nan")
    qs = np.linspace(0.0, 1.0, grid)
    xs = np.unique(np.concatenate([a.digest.quantile(qs), b.digest.quantile(qs)]))
    return float(np.max(np.abs(a.digest.cdf(xs) - b.digest.cdf(xs))))


def wasserstein_distance(a: NumericProfile, b: NumericProfile, *,
                         grid: int = 512) -> float:
    """1-Wasserstein (earth-mover) distance between the two numeric
    profiles via the quantile form W₁ = ∫₀¹ |Q_a(u) − Q_b(u)| du on a
    midpoint grid — the MAGNITUDE-aware drift metric beside the
    scale-free KS gap and the bucketed PSI (a constant shift c gives
    exactly W₁ = |c| while KS saturates). t-digest accuracy contract
    as the other profile metrics (tests bound the error vs exact
    sample W₁ and verify the shift identity)."""
    if a.count == 0 or b.count == 0:
        return float("nan")
    u = (np.arange(grid) + 0.5) / grid
    return float(np.mean(np.abs(a.digest.quantile(u)
                                - b.digest.quantile(u))))


def psi_numeric(baseline: NumericProfile, current: NumericProfile,
                *, buckets: int = 10, eps: float = 1e-4) -> float:
    """PSI over baseline-decile buckets (bucket edges from the baseline
    digest; frequencies from CDF differences)."""
    if baseline.count == 0 or current.count == 0:
        return float("nan")
    edges = baseline.digest.quantile(np.linspace(0, 1, buckets + 1))
    edges = np.unique(edges)
    if len(edges) < 2:
        return 0.0
    # ±inf outer buckets catch mass OUTSIDE the baseline range — without
    # them a fully shifted current distribution has ~0 in-range CDF mass
    # everywhere and PSI collapses to ~0 (missed drift)
    edges = np.concatenate([[-np.inf], edges, [np.inf]])
    pb = np.diff(baseline.digest.cdf(edges))
    pc_ = np.diff(current.digest.cdf(edges))
    pb = np.clip(pb, eps, None)
    pc_ = np.clip(pc_, eps, None)
    pb, pc_ = pb / pb.sum(), pc_ / pc_.sum()
    return float(np.sum((pc_ - pb) * np.log(pc_ / pb)))


def psi_categorical(baseline: CategoricalProfile, current: CategoricalProfile,
                    *, eps: float = 1e-4) -> float:
    keys = sorted(set(baseline.counts) | set(current.counts))
    tb, tc = max(baseline.total, 1), max(current.total, 1)
    pb = np.clip(np.array([baseline.counts.get(k, 0) / tb for k in keys]), eps, None)
    pc_ = np.clip(np.array([current.counts.get(k, 0) / tc for k in keys]), eps, None)
    pb, pc_ = pb / pb.sum(), pc_ / pc_.sum()
    return float(np.sum((pc_ - pb) * np.log(pc_ / pb)))


def new_categories(baseline: CategoricalProfile,
                   current: CategoricalProfile) -> List[str]:
    return sorted(set(current.counts) - set(baseline.counts))


def drift_violations(baseline: TableProfile, current: TableProfile, *,
                     ks_threshold: float = 0.1, psi_threshold: float = 0.2,
                     table: str = "") -> pa.Table:
    """→ violation rows for drifted columns (rule ∈ drift-ks / drift-psi /
    drift-new-category), byte-compatible with the engine violation schema."""
    rows = {"doc_id": [], "rule": [], "path": [], "detail": []}

    def add(rule, col, detail):
        rows["doc_id"].append(table or col)
        rows["rule"].append(rule)
        rows["path"].append(col)
        rows["detail"].append(detail)

    for col in sorted(set(baseline.columns) & set(current.columns)):
        b, c = baseline.columns[col], current.columns[col]
        if isinstance(b, NumericProfile) and isinstance(c, NumericProfile):
            ks = ks_distance(b, c)
            if np.isfinite(ks) and ks > ks_threshold:
                add("drift-ks", col, f"ks={ks:.4f} > {ks_threshold}")
            psi = psi_numeric(b, c)
            if np.isfinite(psi) and psi > psi_threshold:
                add("drift-psi", col, f"psi={psi:.4f} > {psi_threshold}")
        elif isinstance(b, CategoricalProfile) and isinstance(c, CategoricalProfile):
            psi = psi_categorical(b, c)
            if np.isfinite(psi) and psi > psi_threshold:
                add("drift-psi", col, f"psi={psi:.4f} > {psi_threshold}")
            for nc in new_categories(b, c):
                add("drift-new-category", col,
                    f"category {nc!r} absent from baseline")
    return pa.Table.from_pydict(rows, schema=VIOLATIONS)


# ---------------------------------------------------------------------------
# windowed drift (week-over-week) — the A5 weekly-report drift signal
# ---------------------------------------------------------------------------

def profile_by_window(ds, window_col: str, *, numeric: Sequence[str] = (),
                      categorical: Sequence[str] = (),
                      compression: float = 200.0) -> dict:
    """→ {window label: TableProfile}: one sketch row per (window, block,
    column). The window domain is calendar-bounded (weeks, days), so the
    driver merge stays O(#blocks × #windows × #cols) tiny rows no matter
    the input size — the same contract as ``profile_dataset`` with one
    extra bounded dimension."""

    def per_window(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = []
        wins = pc.cast(batch[window_col], pa.string())
        for w in pc.unique(wins).to_pylist():
            sub = batch.filter(pc.equal(wins, w))
            t = _batch_profile(sub, numeric, categorical, compression)
            t = t.append_column("window",
                                pa.array([w] * t.num_rows, pa.string()))
            out.append(t)
        return (pa.concat_tables(out) if out else
                pa.Table.from_pydict({"col": pa.array([], pa.string()),
                                      "payload": pa.array([], pa.string()),
                                      "window": pa.array([], pa.string())}))

    parts = ds.map_batches(per_window, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    profs: dict = {}
    for _, row in parts.iterrows():
        prof = profs.setdefault(row["window"], TableProfile())
        d = json.loads(row["payload"])
        p = (NumericProfile.from_dict(d) if d["kind"] == "numeric"
             else CategoricalProfile.from_dict(d))
        if row["col"] in prof.columns:
            prof.columns[row["col"]].merge(p)
        else:
            prof.columns[row["col"]] = p
    return profs


def consecutive_window_drift(profiles: dict, *, psi_threshold: float = 0.2,
                             ks_threshold: float = 0.2,
                             round_digits: int = 4) -> pa.Table:
    """Window-over-window drift: PSI (and KS for numeric columns)
    between every consecutive pair of sorted window labels →
    (window_from, window_to, col, metric, value, drifted). The
    week-over-week delta a report owner eyeballs (reference weekly
    report, cerberus/reports.py:19-35), made a first-class rule."""
    wins = sorted(profiles)
    rows = []
    for a, b in zip(wins, wins[1:]):
        pa_, pb = profiles[a], profiles[b]
        for col in sorted(set(pa_.columns) & set(pb.columns)):
            x, y = pa_.columns[col], pb.columns[col]
            if isinstance(x, NumericProfile):
                psi = psi_numeric(x, y)
                ks = ks_distance(x, y)
                rows.append((a, b, col, "psi", round(psi, round_digits),
                             psi > psi_threshold))
                rows.append((a, b, col, "ks", round(ks, round_digits),
                             ks > ks_threshold))
            else:
                psi = psi_categorical(x, y)
                rows.append((a, b, col, "psi", round(psi, round_digits),
                             psi > psi_threshold))
                new = new_categories(x, y)
                if new:
                    rows.append((a, b, col, "new-categories",
                                 float(len(new)), True))
    return pa.Table.from_pydict({
        "window_from": pa.array([r[0] for r in rows], pa.string()),
        "window_to": pa.array([r[1] for r in rows], pa.string()),
        "col": pa.array([r[2] for r in rows], pa.string()),
        "metric": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "drifted": pa.array([r[5] for r in rows], pa.bool_())})


def event_rate_anomalies(events_ds, *, type_col: str = "event_type",
                         ts_col: str = "ts", z_thresh: float = 3.0,
                         freq_s: int = 3600, robust: bool = False
                         ) -> pa.Table:
    """Rate-spike detection: bucket events into fixed windows (default
    hourly) per type, fill the GAPS with zero counts (a silent outage is
    as anomalous as a spike), and flag buckets whose count deviates from
    the type's center by more than ``z_thresh`` sigma. The monitoring
    counterpart of the distribution-drift checks — same grounding
    (weekly-report deltas, `cerberus/reports.py:19-35`) at alerting
    granularity.

    ``robust=True`` scores against median/MAD (scaled 1.4826) instead of
    mean/std — a large spike inflates the std enough to mask a
    concurrent outage in the same series; median/MAD is insensitive to
    the anomalies being hunted (reported columns keep their names:
    mean=median, std=scaled MAD).

    Ray shape: one streamed pass of per-block (type, bucket, n) hash
    aggregates; the driver merges O(#types × #buckets) rows — the bucket
    universe is time-domain-bounded (1 year of hours = 8.8k per type).
    Gap filling and the z-scan are vectorized on the merged frame.

    → (event_type, bucket_ts, n_events, mean, std, z) for flagged
    buckets, sorted by (event_type, bucket_ts).
    """
    import pandas as pd
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        bucket = pc.cast(pc.floor_temporal(b[ts_col], unit="hour")
                         if freq_s == 3600 else
                         pc.cast(pc.cast(b[ts_col], pa.int64())
                                 // (freq_s * 1_000_000)
                                 * (freq_s * 1_000_000), pa.timestamp("us")),
                         pa.timestamp("us"))
        t = pa.Table.from_arrays([b[type_col], bucket],
                                 names=["t", "bkt"])
        g = t.group_by(["t", "bkt"]).aggregate([([], "count_all")])
        return pa.Table.from_arrays([g["t"], g["bkt"], g["count_all"]],
                                    names=["t", "bkt", "n"])

    pdf = events_ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    empty = pa.Table.from_pydict({
        "event_type": pa.array([], pa.string()),
        "bucket_ts": pa.array([], pa.timestamp("us")),
        "n_events": pa.array([], pa.int64()),
        "mean": pa.array([], pa.float64()),
        "std": pa.array([], pa.float64()),
        "z": pa.array([], pa.float64())})
    if not len(pdf):
        return empty
    g = pdf.groupby(["t", "bkt"], as_index=False)["n"].sum()
    out_rows = []
    for typ, sub in g.groupby("t"):
        sub = sub.set_index("bkt")["n"]
        full = sub.reindex(pd.date_range(sub.index.min(), sub.index.max(),
                                         freq=f"{freq_s}s"), fill_value=0)
        if robust:
            mu = float(full.median())
            sd = 1.4826 * float((full - mu).abs().median())
            if sd == 0 and mu > 0:
                # MAD degenerates to 0 when most buckets are identical
                # (steady series); counts are Poisson-ish, so √median is
                # the natural scale floor
                sd = max(mu ** 0.5, 1.0)
        else:
            mu = float(full.mean())
            sd = float(full.std(ddof=0))
        if sd == 0:
            continue
        z = (full - mu) / sd
        hits = full[np.abs(z) > z_thresh]
        for ts, n in hits.items():
            out_rows.append((typ, ts, int(n), round(mu, 4), round(sd, 4),
                             round(float((n - mu) / sd), 4)))
    if not out_rows:
        return empty
    out_rows.sort(key=lambda r: (r[0], r[1]))
    return pa.Table.from_pydict({
        "event_type": pa.array([r[0] for r in out_rows], pa.string()),
        "bucket_ts": pa.array([r[1] for r in out_rows], pa.timestamp("us")),
        "n_events": pa.array([r[2] for r in out_rows], pa.int64()),
        "mean": pa.array([r[3] for r in out_rows], pa.float64()),
        "std": pa.array([r[4] for r in out_rows], pa.float64()),
        "z": pa.array([r[5] for r in out_rows], pa.float64())})


def trailing_volume_anomalies(events_ds, *, type_col: str = "event_type",
                              ts_col: str = "ts", window: int = 7,
                              min_history: int = 3,
                              lo_frac: float = 0.5,
                              hi_frac: float = 2.0,
                              season: int | None = None) -> pa.Table:
    """Trailing-baseline partition-volume validation (the Deequ/GX
    "row-count anomaly" check): bucket rows into DAYS per stream,
    gap-fill the global calendar with zeros (a missing partition is the
    worst anomaly), and flag days whose count leaves the
    ``[lo_frac, hi_frac] ×`` band around the TRAILING ``window``-day
    median — each day judged against its own recent history, unlike
    `event_rate_anomalies`' series-global center. Days with fewer than
    ``min_history`` prior days are warm-up and never flagged.

    ``lo_frac``/``hi_frac`` should be exactly-representable binary
    fractions (0.5, 2.0, 0.25 …) so the band compare is bit-identical
    to the SQL oracle's.

    ``season=s`` makes the baseline SEASONAL-PHASE-aware: each day is
    judged against the trailing ``window`` days of the SAME phase
    (day-index mod s; s=7 = same weekday) — a weekly-troughed stream
    stops false-flagging its own Sundays. Warm-up then counts prior
    SAME-PHASE days.

    Ray shape: one streamed pass of per-block (stream, day) count
    partials; the driver merges O(#streams × #days) rows (time-domain
    bounded). Gap-fill and the trailing median are vectorized pandas on
    the merged frame. → (event_type, day, n_events, trailing_median,
    status) for flagged days, ordered by (event_type, day).
    """
    import pandas as pd
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(b[ts_col], unit="day"),
                      pa.timestamp("us"))
        t = pa.Table.from_arrays([b[type_col], day], names=["t", "d"])
        g = t.group_by(["t", "d"]).aggregate([([], "count_all")])
        return pa.Table.from_arrays([g["t"], g["d"], g["count_all"]],
                                    names=["t", "d", "n"])

    pdf = events_ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    empty = pa.Table.from_pydict({
        "event_type": pa.array([], pa.string()),
        "day": pa.array([], pa.timestamp("us")),
        "n_events": pa.array([], pa.int64()),
        "trailing_median": pa.array([], pa.float64()),
        "status": pa.array([], pa.string())})
    if not len(pdf):
        return empty
    g = pdf.groupby(["t", "d"], as_index=False)["n"].sum()
    cal = pd.date_range(g["d"].min(), g["d"].max(), freq="D")
    types = np.sort(g["t"].unique())
    full = (pd.MultiIndex.from_product([types, cal], names=["t", "d"])
            .to_frame(index=False)
            .merge(g, on=["t", "d"], how="left").fillna({"n": 0}))
    full["n"] = full["n"].astype("int64")
    full = full.sort_values(["t", "d"], kind="mergesort"
                            ).reset_index(drop=True)
    if season:
        # phase = day index mod season (per the global calendar) —
        # rows stay globally sorted by (t, d), so within each
        # (t, phase) group order is still chronological
        day_idx = ((full["d"] - cal[0]) // pd.Timedelta(days=1)
                   ).astype("int64")
        full["_ph"] = (day_idx % season).to_numpy()
        gkey = [full["t"], full["_ph"]]
        prev = full.groupby(["t", "_ph"])["n"].shift(1)
    else:
        gkey = [full["t"]]
        prev = full.groupby("t")["n"].shift(1)
    med = (prev.groupby(gkey)
           .rolling(window, min_periods=min_history).median()
           .reset_index(level=list(range(len(gkey))), drop=True)
           .sort_index())    # back to row order (groups interleave)
    nhist = (prev.groupby(gkey)
             .rolling(window, min_periods=1).count()
             .reset_index(level=list(range(len(gkey))), drop=True)
             .sort_index())
    nv = full["n"].to_numpy(dtype="float64")
    mv = med.to_numpy(dtype="float64")
    ok_hist = nhist.to_numpy() >= min_history
    with np.errstate(invalid="ignore"):
        low = ok_hist & ~np.isnan(mv) & (nv < lo_frac * mv)
        high = ok_hist & ~np.isnan(mv) & (nv > hi_frac * mv)
    bad = low | high
    out = full.loc[bad, ["t", "d", "n"]].copy()
    out["trailing_median"] = mv[bad]
    out["status"] = np.where(low[bad], "low", "high")
    out = out.rename(columns={"t": "event_type", "d": "day",
                              "n": "n_events"})
    out = out.sort_values(["event_type", "day"],
                          kind="mergesort").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
