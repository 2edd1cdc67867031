#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline flagship validation pipeline (interleaved docs,
full rule-set: row-local + uniqueness + referential + drift profile) plus
the relational/training query suite over $GRAFT_SF_DIR (default
/root/testdata/sf0.1), then prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ..., "n_docs": ..., "violations": ...}

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR, GRAFT_BENCH_DOCS
(default 400000 interleaved docs for the headline).

--scaling: runs the headline pipeline in two FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the same pre-generated input and reports
both throughputs + scaling efficiency (the sandbox proxy for the
north_rule's N vs 4N cluster sizes; see BASELINE.md).

This script OWNS its Ray session (ray.init/shutdown) — library code never
does.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "3200000"))
N_MEDIA = max(1000, N_DOCS // 10)
DOCS_CACHE = f"/tmp/cerberus_bench/docs_{N_DOCS}"

# representative operator set timed individually (small outputs each)
QUERY_NAMES = [
    "rule_counts_lineitem", "unique_custkey", "ref_lineitem_orderkey",
    "dedup_ngram_verified",
    "order_totalprice_check", "q1_pricing_summary", "events_weekly",
    "events_users_per_type", "events_close_pairs", "doc_nchars_check",
    "dedup_exact_stats", "dedup_minhash", "dedup_simhash",
    "ann_topk_cosine", "doc_quality", "doc_token_stats",
    "revenue_per_nation", "asof_click_before_purchase",
    "events_props_stats", "top_customers_by_revenue", "flagship_violations",
    "events_quantiles", "doc_langid", "dedup_exact_keep",
    "top_orders_per_nation",
    # round-5 oracle promotions (timed once gated)
    "crm_violations", "training_corpus_report", "events_drift_psi",
    # extras-surface training-data ops (timed for the record; they are
    # pytest-gated rather than driver-oracle-gated)
    "token_top_k", "decontamination_report", "lm_quality_report",
    "seq_packing_report", "repeated_substring_report",
    "token_budget_report", "emb_outlier_report",
    "line_dedup_report", "nb_quality_report", "doc_repetition",
    # fourth-session extras
    "ppl_bucket_report", "token_top_k_by_lang", "cross_dedup_report",
    "length_bucket_report", "html_strip_report", "domain_blocklist_report",
    "media_features",
    # seventh-session extras (winsorize/window/pivot/setops/pagerank/
    # collocations/resample/fuzzy-join/scaling/merge/interval-join/corr)
    "winsorize_report", "window_report", "pivot_report", "setops_report",
    "pagerank_report", "collocation_report", "resample_report",
    "fuzzyjoin_report", "standardize_report", "merge_report",
    "interval_join_report", "corr_report",
    # eighth-session extras (hybrid retrieval + MMR re-rank, storage
    # layout + maintenance, entropy signal)
    "hybrid_search_report", "mmr_rerank_report",
    "zorder_layout_report", "compaction_report", "char_entropy_report",
    "bloom_index_report", "catalog_report",
    "q3_shipping_priority", "q10_returned_items",
    "versioned_table_report",
    # ninth-session extras (SCD-2 intervals, Pareto frontier,
    # SQL-auditable sampling, grouped mode)
    "scd2_report", "skyline_report", "stratified_sample_report",
    "mode_report", "triangle_report", "weighted_sample_report",
    "global_rank_report", "entity_resolution_report",
    "schema_union_report", "bucketed_join_report",
    "hopping_window_report", "doremi_report", "k_anonymity_report",
    "coreset_report", "logreg_quality_report", "ols_report",
    "cdf_report", "forecast_report", "cv_report",
    "changepoint_report", "overlap_report", "abtest_report",
    "bootstrap_report",
    "auc_report",
    "survival_report",
    "benford_report",
    "fk_discovery_report",
    "candidate_key_report",
    "fd_report",
    "markov_report",
    "pattern_profile_report",
    "assoc_report",
    "fk_sketch_report",
    "markov2_report",
    "stationary_report",
    "ohlc_report",
    "text_index_report",
    "rfm_report",
    "q5_local_supplier_volume",
    "seasonal_report",
    "encoding_scan_report",
    "sq8_report",
    "dp_counts_report",
    "join_size_report",
    "golden_record_report",
    "spearman_report",
    "itemsets_report",
    "theil_sen_report",
    "conformal_report",
    "isotonic_report",
    "hard_negatives_report",
    "random_negatives_report",
    "weak_label_report",
    "curriculum_report",
    "dedup_eval_report",
    "index_append_report",
    "c2st_report",
    "stream_neardup_report",
    "emb_threshold_report",
    "fd_violations_report",
    "holt_report",
    "interpolate_report",
    "simpson_report",
    "cuped_report",

    "q7_volume_shipping", "q8_market_share",
    "impute_report", "kendall_report",
    "token_jsd_report", "vocab_growth_report",
    "kcore_report", "acf_report",
    "mi_report", "source_entropy_report",
    "cmh_report", "markov_entropy_report",
    "q4_order_priority", "q6_revenue_change",
    "q12_priority_class", "q14_promo_revenue",
    "q15_top_supplier", "q17_small_quantity",
    "q18_large_volume", "q19_disjunctive",
    "q22_stale_customers", "anova_report",
    "concentration_report", "pacf_report",
    "kruskal_report", "brown_forsythe_report",
    "bfs_report", "delta_view_report",
    "attribution_report", "quantile_norm_report",
    "image_dedup_report", "balance_report",
    "audio_dedup_report", "wap_report", "robust_stats_report",
    "raking_report", "target_encoding_report",
    # tenth-session extras (tf-weighted ICWS near-dup, embedding MMD
    # drift, t-closeness privacy census)
    "wminhash_dedup_report", "mmd_drift_report", "t_closeness_report",
    "freshness_report",
    # fourteenth-session extras
    "gbdt_quality_report", "als_recs_report", "ipw_ate_report",
    "gmm_report", "iforest_report", "seq_patterns_report",
    "unigram_tokenizer_report", "mahalanobis_report",
    "grid_density_report", "keyphrase_report", "quantreg_report",
    "copula_synth_report", "nmf_topics_report", "poisson_rate_report",
    "bayes_ab_report", "hmm_report", "coxph_report",
    "word_vectors_report", "woe_iv_report", "sinkhorn_drift_report",
    "grouped_ols_report", "uplift_report", "softmax_topic_report",
    "learning_curve_report",
]


def ensure_docs_cache(cfg):
    """Pre-generate the interleaved table once (generation is input
    production, not pipeline work); reruns read the same parquet."""
    from cerberus_ray.datagen import docs_dataset

    marker = os.path.join(DOCS_CACHE, "_SUCCESS")
    if os.path.exists(marker):
        return
    if os.path.isdir(DOCS_CACHE):  # partial generation → wipe, don't read
        import shutil

        shutil.rmtree(DOCS_CACHE)
    os.makedirs(DOCS_CACHE, exist_ok=True)
    docs_dataset(cfg, parallelism=64,
                 fragment_size=max(N_DOCS // 64, 1)).write_parquet(DOCS_CACHE)
    open(marker, "w").write("ok")


def run_flagship_bench() -> dict:
    """Full rule-set over the interleaved table. The four rule families
    (row-local, uniqueness, referential, drift profile) are INDEPENDENT
    scans, so they execute on concurrent threads — Ray schedules their
    tasks into one CPU pool and each stage's small driver-side merge
    overlaps the others' parallel work instead of serializing the run."""
    import threading

    import ray.data as rd

    from cerberus_ray.datagen import GenConfig, gen_media_catalog
    from cerberus_ray.rules.row_rules import interleaved_ruleset
    from cerberus_ray.stages.drift import profile_dataset
    from cerberus_ray.stages.referential import (
        referential_violations,
        span_media_keys,
    )
    from cerberus_ray.stages.uniqueness import unique_violations
    from cerberus_ray.stages.validate import validate

    cfg = GenConfig(n_docs=N_DOCS, n_media=N_MEDIA)
    ensure_docs_cache(cfg)
    # warm-up: a real map over every block forces Ray worker-process
    # startup AND the OS page cache, so the timed section measures
    # compute + shuffle, not process spawn or first disk read
    rd.read_parquet(DOCS_CACHE).map_batches(
        lambda b: b.slice(0, 1), batch_format="pyarrow").count()

    results = {}
    # fixed block count for BOTH cpu levels: per-block overhead is real
    # (scheduling + driver collection), so blocks ∝ data, not cpus.
    # 32 measured best for the 3.2M-doc input on this host (A/B vs 24/48/
    # 64: 2.3-2.75s vs 3.0-3.9s — 4 concurrent stages x fewer tasks)
    NB = int(os.environ.get("GRAFT_BENCH_BLOCKS", "32"))

    def _read(columns=None):
        return rd.read_parquet(DOCS_CACHE, columns=columns,
                               override_num_blocks=NB)

    media = rd.from_arrow(gen_media_catalog(cfg))

    def make_stage_fns():
        """Dataset plans are built HERE, on the main thread — read_parquet's
        lazy fsspec imports race when first issued from concurrent
        threads; threads below only execute prebuilt plans."""
        ds_full = _read()
        ds_ids = _read(["doc_id"])
        ds_idspans = _read(["doc_id", "spans"])
        ds_spans = _read(["spans"])

        def t_rows():
            rs = interleaved_ruleset(text_max_len=cfg.text_max_len)
            results["row"] = validate(ds_full, rs).count()

        def t_uniq():
            u = unique_violations(ds_ids, ["doc_id"],
                                  rule="unique-doc-id", n_rows_hint=N_DOCS)
            results["uniq"] = u.num_rows

        def t_ref():
            results["ref"] = referential_violations(
                ds_idspans, media, extract=span_media_keys,
                parent_key="media_ref", mode="broadcast").count()

        def t_drift():
            import pyarrow as pa
            import pyarrow.compute as pc

            def span_cols(b: pa.Table) -> pa.Table:
                flat = pc.list_flatten(b["spans"])
                if isinstance(flat, pa.ChunkedArray):
                    flat = flat.combine_chunks()
                return pa.Table.from_arrays(
                    [pc.cast(flat.field("offset"), pa.float64()),
                     flat.field("kind")],
                    names=["offset", "kind"])

            spans_ds = ds_spans.map_batches(
                span_cols, batch_format="pyarrow", zero_copy_batch=True)
            profile_dataset(spans_ds, numeric=["offset"],
                            categorical=["kind"])
            results["drift"] = True

        return (t_rows, t_uniq, t_ref, t_drift)

    # warm pass (untimed, sequential): first execution of each stage pays
    # one-time per-worker import/codegen costs that are independent of the
    # CPU budget; the timed pass measures compute + shuffle
    for f in make_stage_fns():
        f()

    errors = []

    def guard(f):
        def run():
            try:
                f()
            except BaseException as e:  # propagate thread failures
                errors.append(e)
        return run

    # best-of-N to damp shared-host CPU-quota noise (±2x observed);
    # each repeat costs ~3-6s, so 5 is cheap insurance for the record
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "5"))
    sec = float("inf")
    for _ in range(max(repeats, 1)):
        stage_fns = make_stage_fns()
        t0 = time.perf_counter()
        threads = [threading.Thread(target=guard(f)) for f in stage_fns]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        if errors:
            raise errors[0]
        sec = min(sec, time.perf_counter() - t0)
    return {
        "sec": sec,
        "n_docs": N_DOCS,
        "docs_per_sec": round(N_DOCS / sec, 1),
        "violations": int(results["row"] + results["uniq"] + results["ref"]),
    }


def run_queries() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    q = dict(entrymod.queries()) | dict(entrymod.extra_queries())
    # best-of-N per query: single-shot timings on the shared-quota host
    # recorded spurious 1.5-2x regressions round-over-round
    repeats = int(os.environ.get("GRAFT_QUERY_REPEATS", "2"))
    out = {}
    for name in QUERY_NAMES:
        best = float("inf")
        for _ in range(max(repeats, 1)):
            t0 = time.perf_counter()
            r = q[name](SF_DIR)
            # force execution for lazy Datasets
            if hasattr(r, "to_pandas") and not hasattr(r, "num_rows"):
                r.to_pandas()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def main_single():
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # the headline runs FOUR independent datasets concurrently; the
    # streaming executor's per-dataset incremental resource reservation
    # (50% each) serializes their overlap on this host — measured
    # 5.0-6.7 s reserved vs 3.0-4.5 s unreserved on the same input.
    # Each dataset is a plain scan+map over a 158 MB table, so
    # reservation protects nothing here.
    if hasattr(ctx, "op_resource_reservation_enabled"):
        ctx.op_resource_reservation_enabled = False

    flag = run_flagship_bench()
    queries = {} if os.environ.get("GRAFT_HEADLINE_ONLY") else run_queries()
    result = {
        "metric": "flagship interleaved validation wall-clock "
                  "(row rules + uniqueness + referential + drift profile)",
        "value": round(flag["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("/", 1)[-1],
        "num_cpus": NUM_CPUS,
        "n_docs": flag["n_docs"],
        "docs_per_sec": flag["docs_per_sec"],
        "violations": flag["violations"],
    }
    ray.shutdown()
    print(json.dumps(result))


def main_scaling():
    """N vs 4N scaling evidence in fresh processes on the same input.

    Default pair is 2 vs 8 CPUs: this sandbox enforces a CPU quota of
    ~8 effective cores (measured: constant-work-per-process wall time is
    flat up to ~8 processes, then grows linearly — see BASELINE.md), so
    the advertised 32 "CPUs" cannot exercise real 4x parallelism above 8.
    Override with GRAFT_SCALE_LO / GRAFT_SCALE_HI (e.g. 8 / 32).
    """

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_HEADLINE_ONLY="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "8"))
    r_lo, r_hi = run(lo), run(hi)
    tput_lo = r_lo["docs_per_sec"]
    tput_hi = r_hi["docs_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    print(json.dumps({
        f"sec_{lo}": r_lo["value"], f"sec_{hi}": r_hi["value"],
        f"docs_per_sec_{lo}": tput_lo, f"docs_per_sec_{hi}": tput_hi,
        "n_docs": r_lo["n_docs"],
        "cpus": [lo, hi],
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    else:
        main_single()
