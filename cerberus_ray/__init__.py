"""cerberus_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch re-expression of the validation/normalization/derived-value
semantics of the reference CRM (``sourcery-ai-experiments/cerberus``) as a
streaming, partition-parallel Ray Data pipeline:

- ``schema``     — pyarrow schemas for the interleaved document table,
                   media catalog, violations and verdicts.
- ``datagen``    — deterministic (seed-keyed, batch-split-independent)
                   synthetic data generator with injected violations.
- ``rules``      — declarative Rule/RuleSet core + vectorized row-local and
                   relational rule packs.
- ``stages``     — Ray Data stages: normalize, validate (map_batches),
                   uniqueness / referential / aggregate-consistency
                   (shuffle rules), drift (sketch actors).
- ``state``      — mergeable sketches (HLL, Bloom, Count-Min, t-digest) and
                   per-partition checkpoint/lineage manifests.
- ``pipelines``  — flagship interleaved validation pipeline, relational
                   rule-pack, dedup, similarity search, text analysis,
                   multimodal plumbing.

Everything here is pure Python on top of public APIs only (ray[data],
pyarrow, numpy, pandas). Library code NEVER calls ``ray.init`` /
``ray.shutdown`` — sessions are owned by test fixtures, bench.py and CLIs.
"""

__version__ = "0.1.0"
