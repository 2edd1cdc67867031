"""CLI — the engine's management-command surface.

    python -m cerberus_ray validate --docs DIR|gen:N --media gen \
        --checkpoint-dir CKPT [--fragment-size K] [--out OUT]
    python -m cerberus_ray corpus --input docs.parquet --out DIR \
        [--threshold 0.8]
    python -m cerberus_ray profile --input table.parquet \
        --numeric col1,col2 --categorical col3 --out profile.json

Owns its Ray session (library code never calls ray.init). ``gen:N`` uses
the deterministic seed-42 interleaved generator for the docs side.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None, address: str | None = None):
    """Attach or start a Ray session. Under ``ray job submit`` the job
    runtime exports RAY_ADDRESS (e.g. ``auto``) and the driver script
    attaches to the fixed-size cluster; with no address (or ``local``)
    a local session starts — the sandbox/test path. ``num_cpus`` only
    applies to a locally-started session (a cluster defines its own)."""
    import os

    import ray

    if not ray.is_initialized():
        addr = address or os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if addr == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(address=addr, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_validate(args) -> int:
    from .datagen import GenConfig
    from .pipelines.flagship import run_flagship_checkpointed

    if not args.docs.startswith("gen:"):
        print("only gen:N docs are wired in this sandbox (no external data)",
              file=sys.stderr)
        return 2
    n = int(args.docs.split(":", 1)[1])
    cfg = GenConfig(n_docs=n, n_media=max(200, n // 10))
    r = run_flagship_checkpointed(cfg, args.checkpoint_dir,
                                  fragment_size=args.fragment_size,
                                  run_id=args.run_id)
    summary = {
        "n_docs": n,
        "n_violations": int(r["violations"].num_rows),
        "processed_fragments": r["processed_fragments"],
        "skipped_fragments": r["skipped_fragments"],
        "all_pass": bool(r["verdicts"].to_pandas()["pass"].all()),
    }
    if args.out:
        import pyarrow.parquet as pq

        pq.write_table(r["violations"], args.out)
        summary["out"] = args.out
    print(json.dumps(summary))
    return 0


def cmd_corpus(args) -> int:
    import ray.data as rd

    from .pipelines.corpus import build_training_corpus

    ds = rd.read_parquet(args.input)
    bench = rd.read_parquet(args.benchmark) if args.benchmark else None
    mix = None
    if args.mix:
        mix = {}
        for part in args.mix.split(","):
            src, w = part.split("=", 1)
            mix[src.strip()] = float(w)
    ref = rd.read_parquet(args.reference) if args.reference else None
    blocklist = ([d.strip() for d in args.blocklist.split(",") if d.strip()]
                 if args.blocklist else None)
    ppl_keep = (tuple(b.strip() for b in args.ppl_keep.split(",") if b.strip())
                if args.ppl_keep else None)
    r = build_training_corpus(ds, out_dir=args.out,
                              near_threshold=args.threshold,
                              benchmark_ds=bench, mixing_weights=mix,
                              cut_ngram=args.cut_ngram,
                              strip_markup=args.strip_markup,
                              c4_rules=args.c4_rules,
                              blocklist=blocklist, reference_ds=ref,
                              ppl_keep=ppl_keep)
    print(json.dumps({
        "n_input": r.n_input, "n_quality_pass": r.n_quality_pass,
        "n_after_exact_dedup": r.n_after_exact_dedup,
        "n_after_near_dedup": r.n_after_near_dedup, "out": args.out}))
    return 0


def cmd_outbox(args) -> int:
    """Render invoices + compose guarded RFC-822 messages into a parquet
    outbox (S6/S7 sinks over the deterministic CRM fixture corpus —
    ``--fixtures`` — or user parquet tables)."""
    import ray.data as rd

    from .crm.render import compose_emails, render_invoices, write_outbox

    if args.fixtures:
        from .crm.fixtures import make_crm_tables

        t, _ = make_crm_tables()
        invoices = rd.from_arrow(t["invoices"])
        charges = rd.from_arrow(t["charges"])
        customers = rd.from_arrow(t["customers"])
    else:
        invoices = rd.read_parquet(args.invoices)
        charges = rd.read_parquet(args.charges)
        customers = rd.read_parquet(args.customers)
    rendered = render_invoices(invoices, charges)
    msgs = compose_emails(rendered, invoices, customers)
    n_msgs = msgs.count()
    n_files = write_outbox(msgs, args.out)
    print(json.dumps({"n_messages": int(n_msgs), "n_files": int(n_files),
                      "out": args.out}))
    return 0


def cmd_datasheet(args) -> int:
    """Per-(source, lang) corpus composition summary — the release
    datasheet (volumes, dup rate, quality-gate share)."""
    import ray.data as rd

    from .pipelines.datasheet import corpus_datasheet

    ds = rd.read_parquet(args.input)
    groups = [c.strip() for c in args.group.split(",") if c.strip()]
    t = corpus_datasheet(ds, group_cols=groups)
    if args.out:
        import pyarrow.parquet as pq

        pq.write_table(t, args.out)
    print(json.dumps({"rows": t.to_pandas().to_dict("records"),
                      "out": args.out}))
    return 0


def cmd_profile(args) -> int:
    import ray.data as rd

    from .stages.drift import profile_dataset

    ds = rd.read_parquet(args.input)
    numeric = [c for c in args.numeric.split(",") if c] if args.numeric else []
    cat = [c for c in args.categorical.split(",") if c] \
        if args.categorical else []
    prof = profile_dataset(ds, numeric=numeric, categorical=cat)
    with open(args.out, "w") as f:
        f.write(prof.to_json())
    print(json.dumps({"columns": sorted(prof.columns), "out": args.out}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="cerberus_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--address", default=None,
                   help="Ray address ('auto' under ray job submit; "
                        "default: $RAY_ADDRESS or a local session)")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="checkpointed flagship validation")
    v.add_argument("--docs", required=True, help="gen:N (seeded generator)")
    v.add_argument("--checkpoint-dir", required=True)
    v.add_argument("--fragment-size", type=int, default=10_000)
    v.add_argument("--run-id", default="run-0")
    v.add_argument("--out", default=None, help="violations parquet path")
    v.set_defaults(fn=cmd_validate)

    c = sub.add_parser("corpus", help="training-corpus construction")
    c.add_argument("--input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--threshold", type=float, default=0.8)
    c.add_argument("--benchmark", default=None,
                   help="parquet of held-out docs: drop n-gram overlaps")
    c.add_argument("--mix", default=None,
                   help="per-source sampling weights, e.g. 'web=0.5,code=1'")
    c.add_argument("--cut-ngram", type=int, default=None,
                   help="remove cross-doc duplicated >=N-token passages")
    c.add_argument("--strip-markup", action="store_true",
                   help="run the HTML strip chain before the gate")
    c.add_argument("--c4-rules", action="store_true",
                   help="apply C4 line filters + page gates after "
                        "markup strip")
    c.add_argument("--blocklist", default=None,
                   help="comma-separated bad domains to drop on mention")
    c.add_argument("--reference", default=None,
                   help="parquet of a prior release: drop exact matches")
    c.add_argument("--ppl-keep", default=None,
                   help="CCNet buckets to keep, e.g. 'head,middle'")
    c.set_defaults(fn=cmd_corpus)

    dsh = sub.add_parser("datasheet", help="corpus composition summary")
    dsh.add_argument("--input", required=True)
    dsh.add_argument("--group", default="source,lang")
    dsh.add_argument("--out", default=None, help="optional parquet path")
    dsh.set_defaults(fn=cmd_datasheet)

    ob = sub.add_parser("outbox", help="render + compose invoice messages")
    ob.add_argument("--fixtures", action="store_true",
                    help="use the deterministic CRM fixture corpus")
    ob.add_argument("--invoices", default=None)
    ob.add_argument("--charges", default=None)
    ob.add_argument("--customers", default=None)
    ob.set_defaults(fn=cmd_outbox)
    ob.add_argument("--out", required=True)

    pr = sub.add_parser("profile", help="drift baseline profile")
    pr.add_argument("--input", required=True)
    pr.add_argument("--numeric", default="")
    pr.add_argument("--categorical", default="")
    pr.add_argument("--out", required=True)
    pr.set_defaults(fn=cmd_profile)

    args = p.parse_args(argv)
    _init_ray(args.num_cpus, args.address)
    try:
        return args.fn(args)
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
