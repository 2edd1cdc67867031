"""End-to-end training-corpus construction — the canonical large-scale
data pipeline composed from the engine's operators:

    read → quality score + gate (actor pool) → exact dedup (hash keep-
    first) → near-dedup (MinHash-LSH → components → keep-first) →
    seeded global shuffle → partitioned parquet write + manifest

Every stage streams; the only materialized artifacts are the near-dup
pair/cluster tables (small by construction) and the output files. The
seeded `random_shuffle` makes the output byte-reproducible, and the
partitioned layout + manifest make the write resumable/verifiable
(the checkpoint story of state/checkpoint.py applied to a sink).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, Optional

import pyarrow as pa


@dataclass
class CorpusReport:
    n_input: int
    n_quality_pass: int
    n_after_exact_dedup: int
    n_after_near_dedup: int
    n_written: int
    clusters: Optional[pa.Table] = None
    out_dir: Optional[str] = None
    stats: Dict = field(default_factory=dict)


def _content_fingerprint(ds, text_col: str, key_col: str) -> int:
    """Order-independent content fingerprint: xor-fold of per-row
    hash(key|text), xored across blocks. One streaming pass; 8 bytes per
    block reach the driver. Guards the sink-level resume against a
    changed input that happens to keep the same row count."""
    import numpy as np
    import pyarrow.compute as pc

    from ..determinism import hash_strings

    def fold(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(b[text_col], pa.string()), "")
        if key_col in b.column_names:
            s = pc.binary_join_element_wise(
                pc.cast(b[key_col], pa.string()), txt, "|")
        else:
            # keyless side inputs are legal (a text-only benchmark /
            # reference set: decontamination and cross-corpus dedup
            # never need their key) — fingerprint the text alone
            s = txt
        hv = hash_strings(s.to_numpy(zero_copy_only=False))
        x = int(np.bitwise_xor.reduce(hv)) if len(hv) else 0
        return pa.Table.from_pydict({"x": pa.array([x], pa.uint64())})

    parts = ds.map_batches(fold, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    acc = 0
    for v in parts.get("x", []):
        acc ^= int(v)
    return acc


def build_training_corpus(docs_ds, *, out_dir: Optional[str] = None,
                          text_col: str = "text", key_col: str = "doc_id",
                          near_threshold: float = 0.8, bands: int = 32,
                          shuffle_seed: int = 42,
                          quality_concurrency: int = 2,
                          min_rows_per_file: int = 100_000,
                          resume: bool = True,
                          benchmark_ds=None,
                          decontaminate_ngram: int = 8,
                          mixing_weights: Optional[Dict[str, float]] = None,
                          source_col: str = "source",
                          cut_ngram: Optional[int] = None,
                          near_exact: bool = False,
                          strip_markup: bool = False,
                          normalize_unicode: Optional[str] = None,
                          c4_rules: bool = False,
                          blocklist=None,
                          reference_ds=None,
                          ppl_keep=None,
                          lang_col: str = "lang") -> CorpusReport:
    """Optional hygiene/shaping stages extend the funnel when supplied:
    ``strip_markup`` runs the HTML strip chain as stage 0 (webclean),
    ``normalize_unicode`` (a form name, e.g. ``"NFKC"``) canonicalizes
    the text right after markup strip so byte-distinct encodings of the
    same content collapse in BOTH dedup stages,
    ``c4_rules`` applies the C4 line filters + page gates (Raffel et
    al. 2020 §2.2) after markup strip, ``blocklist`` drops documents
    mentioning blocklisted domains before
    the quality gate, ``benchmark_ds`` inserts a decontamination
    drop-filter (n-gram overlap vs the held-out set) after the quality
    gate, ``cut_ngram`` removes cross-doc duplicated ≥n-token passages
    (substring_dedup) between exact and near dedup, ``reference_ds``
    drops content already present in a prior corpus release (cross-corpus
    exact dedup) after in-corpus exact dedup, ``ppl_keep`` (e.g.
    ``("head", "middle")``) applies the CCNet per-language perplexity
    split after the heuristic gate and keeps only the named buckets
    (requires ``lang_col``), ``mixing_weights`` applies deterministic
    per-source sampling after near-dedup, and ``near_exact`` swaps the
    near-dedup pair stage from MinHash-LSH (probabilistic, the scale
    path) to the exact prefix-filter set-similarity join (recall 1 —
    the oracle-checkable path the driver query rides). Defaults leave
    the classic 4-stage funnel unchanged."""
    from ..pipelines.dedup import dedup_near_keep_first, exact_dedup_keep_first

    # optional 0. markup strip + domain blocklist (web hygiene front door)
    if strip_markup:
        from ..pipelines.webclean import strip_html

        docs_ds = strip_html(docs_ds, text_col=text_col)
    if normalize_unicode:
        from ..pipelines.webclean import normalize_unicode as _uni_stage

        docs_ds = _uni_stage(docs_ds, text_col=text_col,
                             form=normalize_unicode)
    if c4_rules:
        from ..pipelines.webclean import c4_clean

        docs_ds = c4_clean(docs_ds, text_col=text_col)
    if blocklist:
        from ..pipelines.webclean import drop_blocklisted

        docs_ds = drop_blocklisted(docs_ds, blocklist, text_col=text_col)
    if strip_markup or normalize_unicode or c4_rules or blocklist:
        docs_ds = docs_ds.materialize()

    n_input = docs_ds.count()
    # the fingerprint pass is only paid when a manifest could be written
    # or matched (out_dir runs); pure-report runs skip it
    fingerprint = (_content_fingerprint(docs_ds, text_col, key_col)
                   if out_dir is not None else None)
    bench_fp = (_content_fingerprint(benchmark_ds, text_col, key_col)
                if out_dir is not None and benchmark_ds is not None else None)
    ref_fp = (_content_fingerprint(reference_ds, text_col, key_col)
              if out_dir is not None and reference_ds is not None else None)
    block_key = sorted({d.lower() for d in blocklist}) if blocklist else None
    mix_key = (sorted(mixing_weights.items()) if mixing_weights else None)

    # sink-level resume: a completed run left a manifest whose input size,
    # CONTENT fingerprint and parameters match — skip the whole rebuild
    # (the per-fragment variant of this lives in state/checkpoint.py; here
    # the corpus is one atomic sink, so completion is all-or-nothing)
    if resume and out_dir is not None:
        mp = os.path.join(out_dir, "manifest.json")
        if os.path.exists(mp) and os.path.isdir(os.path.join(out_dir, "data")):
            try:
                with open(mp) as f:
                    m = json.load(f)
            except (json.JSONDecodeError, OSError):
                m = None
            mk = ([list(t) for t in mix_key] if mix_key else None)
            if m and (m.get("n_input") == int(n_input)
                      and m.get("content_fingerprint") == fingerprint
                      and m.get("benchmark_fingerprint") == bench_fp
                      and m.get("reference_fingerprint") == ref_fp
                      and m.get("strip_markup") == strip_markup
                      and m.get("c4_rules", False) == c4_rules
                      and m.get("normalize_unicode") == normalize_unicode
                      and m.get("ppl_keep") == (sorted(ppl_keep)
                                                if ppl_keep else None)
                      and m.get("blocklist") == block_key
                      and m.get("mixing_weights") == mk
                      and m.get("cut_ngram") == cut_ngram
                      and m.get("near_exact", False) == near_exact
                      and m.get("decontaminate_ngram",
                                8) == decontaminate_ngram
                      and m.get("source_col", "source") == source_col
                      and m.get("lang_col", "lang") == lang_col
                      and m.get("near_threshold") == near_threshold
                      and m.get("bands") == bands
                      and m.get("shuffle_seed") == shuffle_seed):
                cp = os.path.join(out_dir, "clusters.parquet")
                clusters = None
                if os.path.exists(cp):
                    import pyarrow.parquet as pq

                    clusters = pq.read_table(cp)
                return CorpusReport(
                    n_input=m["n_input"],
                    n_quality_pass=m["n_quality_pass"],
                    n_after_exact_dedup=m["n_after_exact_dedup"],
                    n_after_near_dedup=m["n_after_near_dedup"],
                    n_written=m["n_after_near_dedup"], clusters=clusters,
                    out_dir=out_dir, stats={"resumed": True})

    # 1. quality gate — the TextScorer heuristics applied inline, keeping
    # the original columns (task-pool stage with a per-worker scorer
    # singleton: the scorer's setup is a frozenset assignment, so an
    # actor pool would only add startup cost per execution)
    import pandas as pd

    from ..pipelines.text import _score_batch

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        # the scorer kernel reads the fixed "text" column — rename a
        # non-default text_col into place for SCORING only (dropping a
        # stray unrelated "text" column from the scoring copy so the
        # gate never filters on the wrong column)
        sb = b.copy()
        if text_col != "text":
            sb = sb.drop(columns=["text"], errors="ignore") \
                   .rename(columns={text_col: "text"})
        stats = _score_batch(sb)
        return b[stats["quality_pass"].to_numpy()]

    # Each stage is materialized once so the funnel counts and the next
    # stage share one execution — without this, every count() re-runs the
    # cumulative lineage (gate re-executed 4x, dedup 3x, ...). At
    # petabyte scale the parquet sink is the materialization boundary
    # instead (counts come from file metadata); here the object store
    # holds it and spills as needed.
    gate_kw = ({"concurrency": quality_concurrency}
               if quality_concurrency else {})
    kept_text = docs_ds.map_batches(gate, batch_format="pandas", **gate_kw)
    # optional 1b. benchmark decontamination (eval-set hygiene)
    if benchmark_ds is not None:
        from ..pipelines.decontaminate import drop_contaminated

        kept_text = drop_contaminated(kept_text, benchmark_ds,
                                      text_col=text_col, key_col=key_col,
                                      n=decontaminate_ngram)
    # optional 1c. CCNet perplexity gate: per-language tercile split on
    # the corpus-fit unigram model, keep the configured buckets
    if ppl_keep:
        import pyarrow.compute as pc

        from ..pipelines.lm_score import bucket_by_perplexity

        kept_text = kept_text.materialize()
        labeled = bucket_by_perplexity(
            kept_text.select_columns([key_col, lang_col, text_col]),
            text_col=text_col, key_col=key_col, lang_col=lang_col)

        def winners(b: pa.Table) -> pa.Table:
            m = pc.is_in(b["bucket"],
                         value_set=pa.array(list(ppl_keep), pa.string()))
            # bucket_by_perplexity's key output column is named doc_id
            # regardless of key_col (it casts the key to string)
            return pa.Table.from_arrays([b.filter(m)["doc_id"]],
                                        names=["_ppl_key"])

        import numpy as np
        import ray

        kdf = labeled.map_batches(winners, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
        # zero surviving rows can lose the schema (empty-union gotcha)
        keys = (kdf["_ppl_key"].to_numpy(dtype=object)
                if "_ppl_key" in kdf.columns
                else np.empty(0, dtype=object))
        kref = ray.put(np.sort(keys))

        def keep_ids(b: pa.Table) -> pa.Table:
            lut = ray.get(kref)
            k = pc.cast(b[key_col], pa.string()).to_numpy(
                zero_copy_only=False).astype(object)
            if len(lut):
                pos = np.clip(np.searchsorted(lut, k), 0, len(lut) - 1)
                hit = lut[pos] == k
            else:
                hit = np.zeros(len(k), dtype=bool)
            return b.filter(pa.array(hit))

        # the kept-id broadcast is O(kept docs) — at corpus scale the
        # labeled Dataset instead joins back on key (hash-partitioned,
        # the exact_dedup_keep_first 'join' plan); driver band documented
        kept_text = kept_text.map_batches(keep_ids, batch_format="pyarrow",
                                          zero_copy_batch=True)
    kept_text = kept_text.materialize()
    n_quality = kept_text.count()

    # 2. exact dedup (min-key winner per content hash)
    exact = exact_dedup_keep_first(kept_text, text_col=text_col,
                                   key_col=key_col)
    exact = exact.drop_columns(["text_md5"])
    # optional 2a. cross-corpus dedup against a prior release
    if reference_ds is not None:
        from ..pipelines.dedup import exact_dedup_against

        # upper bound for the probe side (exact ≤ quality-kept rows):
        # join mode must size its exchange from the LARGER side
        exact = exact_dedup_against(exact, reference_ds, text_col=text_col,
                                    n_left_hint=n_quality)
    exact = exact.materialize()
    n_exact = exact.count()

    # optional 2b. cut cross-doc duplicated passages (boilerplate,
    # licenses, quoted blocks) before near-dedup, so residual boilerplate
    # doesn't glue otherwise-distinct docs into near-dup clusters
    if cut_ngram:
        from ..pipelines.substring_dedup import (cut_duplicated_substrings,
                                                 duplicated_shingle_hashes)

        dup_h = duplicated_shingle_hashes(exact, text_col=text_col,
                                          n=cut_ngram, min_docs=2)
        if len(dup_h):
            exact = cut_duplicated_substrings(
                exact, dup_h, text_col=text_col, n=cut_ngram).materialize()

    # 3. near-dedup (pairs → connected components → keep cluster min);
    # n_rows_hint = the count already taken above, so the mode planner
    # doesn't re-execute the (computed) dataset for its own count().
    # near_exact swaps the MinHash-LSH pair stage (the probabilistic
    # scale path) for the exact prefix-filter set-similarity join
    # (recall/precision 1 — SQL-reproducible, hence oracle-checkable)
    deduped, clusters = dedup_near_keep_first(
        exact, text_col=text_col, key_col=key_col,
        threshold=near_threshold, bands=bands, n_rows_hint=int(n_exact),
        pair_method="exact" if near_exact else "minhash")
    # optional 3b. domain mixing (deterministic per-source sampling)
    if mixing_weights:
        from ..pipelines.mixing import sample_by_source

        deduped = sample_by_source(deduped, mixing_weights,
                                   source_col=source_col, key_col=key_col,
                                   seed=shuffle_seed)
    deduped = deduped.materialize()
    n_near = deduped.count()

    # 4. seeded global shuffle (training-order decorrelation)
    shuffled = deduped.random_shuffle(seed=shuffle_seed)

    # 5. partitioned write + manifest
    n_written = n_near
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        shuffled.write_parquet(os.path.join(out_dir, "data"),
                               min_rows_per_file=min_rows_per_file)
        if clusters is not None:
            import pyarrow.parquet as pq

            pq.write_table(clusters, os.path.join(out_dir, "clusters.parquet"))
        manifest = {
            "n_input": int(n_input), "n_quality_pass": int(n_quality),
            "n_after_exact_dedup": int(n_exact),
            "n_after_near_dedup": int(n_near),
            "near_threshold": near_threshold, "bands": bands,
            "shuffle_seed": shuffle_seed,
            "content_fingerprint": fingerprint,
            "benchmark_fingerprint": bench_fp,
            "reference_fingerprint": ref_fp,
            "strip_markup": strip_markup,
            "c4_rules": c4_rules,
            "normalize_unicode": normalize_unicode,
            "blocklist": block_key,
            "ppl_keep": sorted(ppl_keep) if ppl_keep else None,
            "cut_ngram": cut_ngram,
            "near_exact": near_exact,
            "decontaminate_ngram": decontaminate_ngram,
            "source_col": source_col,
            "lang_col": lang_col,
            "mixing_weights": ([list(t) for t in mix_key]
                               if mix_key else None),
        }
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True, indent=1)

    return CorpusReport(
        n_input=int(n_input), n_quality_pass=int(n_quality),
        n_after_exact_dedup=int(n_exact), n_after_near_dedup=int(n_near),
        n_written=int(n_written), clusters=clusters, out_dir=out_dir)
