"""End-to-end training-corpus pipeline: gate → exact dedup → near dedup →
seeded shuffle → partitioned write + manifest; reproducible output."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from cerberus_ray.pipelines.corpus import build_training_corpus

BASE = ("the quick brown fox jumps over the lazy dog while the rain falls "
        "gently on the quiet village roofs every single evening again")


def corpus_df():
    rng = np.random.default_rng(42)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron").split()
    rows = []
    for i in range(40):
        rows.append({"doc_id": f"g{i:03d}",
                     "text": " ".join(rng.choice(words, size=40))})
    rows.append({"doc_id": "dup1", "text": BASE})
    rows.append({"doc_id": "dup2", "text": BASE})                      # exact dup
    rows.append({"doc_id": "near1", "text": BASE.replace("quiet", "noisy")})
    rows.append({"doc_id": "junk1", "text": "!!! ??? !!!"})            # fails gate
    rows.append({"doc_id": "junk2", "text": "a a a a a a a a a a a a"})  # low unique ratio
    return pd.DataFrame(rows)


def test_corpus_pipeline(ray_session, tmp_path):
    out = str(tmp_path / "corpus")
    r = build_training_corpus(rd.from_pandas(corpus_df()), out_dir=out,
                              near_threshold=0.5, bands=32,
                              min_rows_per_file=1000)
    assert r.n_input == 45
    assert r.n_quality_pass == 43            # two junk docs gated out
    assert r.n_after_exact_dedup == 42       # dup2 dropped (min key dup1)
    assert r.n_after_near_dedup == 41        # near1 clustered with dup1
    files = [f for f in os.listdir(os.path.join(out, "data"))
             if f.endswith(".parquet")]
    assert files
    written = pq.read_table(os.path.join(out, "data"))
    assert written.num_rows == 41
    ids = set(written["doc_id"].to_pylist())
    assert "dup1" in ids and "dup2" not in ids and "near1" not in ids
    assert "junk1" not in ids
    m = json.load(open(os.path.join(out, "manifest.json")))
    assert m["n_after_near_dedup"] == 41


def test_corpus_shuffle_reproducible(ray_session, tmp_path):
    a = build_training_corpus(rd.from_pandas(corpus_df()),
                              out_dir=str(tmp_path / "a"),
                              near_threshold=0.5, bands=32,
                              min_rows_per_file=1000)
    b = build_training_corpus(rd.from_pandas(corpus_df()),
                              out_dir=str(tmp_path / "b"),
                              near_threshold=0.5, bands=32,
                              min_rows_per_file=1000)
    ta = pq.read_table(str(tmp_path / "a" / "data")).to_pandas()
    tb = pq.read_table(str(tmp_path / "b" / "data")).to_pandas()
    sa = ta.sort_values("doc_id").reset_index(drop=True)
    sb = tb.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(sa, sb)  # same content either way


def test_corpus_write_resumes_from_manifest(ray_session, tmp_path):
    """A completed corpus run (manifest + data present, same input size
    and parameters) is not rebuilt; changed parameters force a rebuild."""
    import os

    import ray.data as rd

    from cerberus_ray.pipelines.corpus import build_training_corpus

    import pandas as pd
    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(40)],
                       "text": [f"some sufficiently long document text number {i} "
                                f"with words words words" for i in range(40)]})
    d = str(tmp_path / "corpus")
    r1 = build_training_corpus(rd.from_pandas(df), out_dir=d)
    assert not r1.stats.get("resumed")
    mtime = os.path.getmtime(os.path.join(d, "manifest.json"))

    r2 = build_training_corpus(rd.from_pandas(df), out_dir=d)
    assert r2.stats.get("resumed") is True
    assert r2.n_after_near_dedup == r1.n_after_near_dedup
    assert os.path.getmtime(os.path.join(d, "manifest.json")) == mtime

    r3 = build_training_corpus(rd.from_pandas(df), out_dir=d,
                               near_threshold=0.5)
    assert not r3.stats.get("resumed")  # parameter change -> rebuild


def test_corpus_resume_rejects_changed_content(ray_session, tmp_path):
    """Same row count + params but different CONTENT must NOT resume —
    the manifest's content fingerprint is the gate."""
    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(40)],
                       "text": [f"some sufficiently long document text "
                                f"number {i} with words words words"
                                for i in range(40)]})
    d = str(tmp_path / "corpus_fp")
    r1 = build_training_corpus(rd.from_pandas(df), out_dir=d)
    assert not r1.stats.get("resumed")

    df2 = df.copy()
    df2.loc[0, "text"] = "a completely different but equally long text here"
    r2 = build_training_corpus(rd.from_pandas(df2), out_dir=d)
    assert not r2.stats.get("resumed")  # content changed -> rebuild

    r3 = build_training_corpus(rd.from_pandas(df2), out_dir=d)
    assert r3.stats.get("resumed") is True  # now matches the new manifest


def test_corpus_resume_restores_clusters(ray_session, tmp_path):
    """A resumed run reloads the persisted near-dup cluster table instead
    of silently returning clusters=None."""
    ds = rd.from_pandas(corpus_df())
    d = str(tmp_path / "corpus_cl")
    r1 = build_training_corpus(ds, out_dir=d)
    assert r1.clusters is not None
    r2 = build_training_corpus(rd.from_pandas(corpus_df()), out_dir=d)
    assert r2.stats.get("resumed") is True
    assert r2.clusters is not None
    assert r2.clusters.equals(r1.clusters)


def test_corpus_funnel_sf001_exact_counts(ray_session):
    """Driver-surface pin: the training_corpus_report funnel at sf0.01 is
    deterministic — exact expected counts (VERDICT r2 item 8)."""
    from cerberus_ray.pipelines.training_queries import (
        q_training_corpus_report,
    )

    t = q_training_corpus_report("/root/testdata/sf0.01").to_pydict()
    assert t == {"n_input": [500], "n_quality_pass": [500],
                 "n_after_exact_dedup": [500],
                 "n_after_near_dedup": [476]}


def test_corpus_cut_ngram_stage(ray_session, tmp_path):
    """cut_ngram removes cross-doc boilerplate passages span-wise (both
    docs SURVIVE with the shared block cut out) and keys the resume
    manifest."""
    boiler = " ".join(f"license{j}" for j in range(20))
    rows = []
    for i in range(30):
        rows.append({"doc_id": f"d{i:02d}",
                     "text": " ".join(f"u{i}w{j}" for j in range(40))})
    rows[4]["text"] = boiler + " " + rows[4]["text"]
    rows[9]["text"] = rows[9]["text"] + " " + boiler
    df = pd.DataFrame(rows)
    d = str(tmp_path / "corpus_cut")
    r1 = build_training_corpus(rd.from_pandas(df), out_dir=d, cut_ngram=10)
    assert r1.n_after_near_dedup == 30  # nothing dropped, only cut
    texts = (pq.read_table(os.path.join(d, "data")).to_pandas()
             .set_index("doc_id")["text"])
    assert "license0" not in texts["d04"] and "license19" not in texts["d09"]
    assert texts["d04"] == " ".join(f"u4w{j}" for j in range(40))
    assert texts["d09"] == " ".join(f"u9w{j}" for j in range(40))
    assert texts["d00"] == " ".join(f"u0w{j}" for j in range(40))

    r2 = build_training_corpus(rd.from_pandas(df), out_dir=d, cut_ngram=10)
    assert r2.stats.get("resumed") is True
    r3 = build_training_corpus(rd.from_pandas(df), out_dir=d)
    assert not r3.stats.get("resumed")  # cut_ngram change -> rebuild


def test_corpus_optional_hygiene_stages(ray_session, tmp_path):
    """benchmark_ds inserts a decontamination drop and mixing_weights a
    per-source sampler; both key the resume manifest (changed optional
    params must rebuild)."""
    df = corpus_df().assign(source="src0")
    bench = pd.DataFrame({"doc_id": ["b1"], "text": [BASE]})
    d = str(tmp_path / "corpus_hyg")
    r1 = build_training_corpus(rd.from_pandas(df), out_dir=d,
                               benchmark_ds=rd.from_pandas(bench),
                               decontaminate_ngram=8)
    # BASE-derived docs (dup1/dup2/near1) share 8-grams with the benchmark
    assert r1.n_quality_pass < 43
    ids = set(pq.read_table(os.path.join(d, "data"))
              .column("doc_id").to_pylist())
    assert {"dup1", "dup2", "near1"}.isdisjoint(ids)

    # same params resume; different mixing weights rebuild
    r2 = build_training_corpus(rd.from_pandas(df), out_dir=d,
                               benchmark_ds=rd.from_pandas(bench),
                               decontaminate_ngram=8)
    assert r2.stats.get("resumed") is True
    r3 = build_training_corpus(rd.from_pandas(df), out_dir=d,
                               benchmark_ds=rd.from_pandas(bench),
                               decontaminate_ngram=8,
                               mixing_weights={"src0": 0.5})
    assert not r3.stats.get("resumed")
    assert r3.n_after_near_dedup < r1.n_after_near_dedup


def test_corpus_webclean_and_reference_stages(ray_session, tmp_path):
    """strip_markup fixes otherwise-gate-failing HTML wrappers, blocklist
    drops a doc, reference_ds drops already-released content, and the
    manifest resume invalidates when those knobs change."""
    df = corpus_df()
    # wrap one good doc in markup; without strip_markup its exact-dup
    # twin would NOT collide (different bytes)
    df.loc[df["doc_id"] == "dup2", "text"] = (
        "<html><body><p>" + BASE + "</p><script>x()</script></body></html>")
    df = pd.concat([df, pd.DataFrame([
        {"doc_id": "blocked1",
         "text": "lambda mu nu xi omicron visit ads.bad-site.example now "
                 "alpha beta gamma delta epsilon zeta eta theta iota"},
    ])], ignore_index=True)
    # prior release already contains doc g000's content
    prior = pd.DataFrame([{"doc_id": "old1",
                           "text": df.loc[df["doc_id"] == "g000",
                                          "text"].iloc[0]}])
    out = str(tmp_path / "c")
    r = build_training_corpus(
        rd.from_pandas(df), out_dir=out, near_threshold=0.5, bands=32,
        min_rows_per_file=1000, strip_markup=True,
        blocklist=["bad-site.example"],
        reference_ds=rd.from_pandas(prior))
    # blocked1 dropped before the gate: 46 - 1 = 45 input rows
    assert r.n_input == 45
    assert r.n_quality_pass == 43
    # dup2's markup stripped back to BASE -> exact dup of dup1 (42), and
    # g000 dropped against the prior release (41)
    assert r.n_after_exact_dedup == 41
    written = pq.read_table(os.path.join(out, "data"))
    ids = set(written["doc_id"].to_pylist())
    assert "blocked1" not in ids and "g000" not in ids
    assert "dup2" not in ids and "dup1" in ids
    # resume honors the new manifest keys: same call resumes...
    r2 = build_training_corpus(
        rd.from_pandas(df), out_dir=out, near_threshold=0.5, bands=32,
        min_rows_per_file=1000, strip_markup=True,
        blocklist=["bad-site.example"],
        reference_ds=rd.from_pandas(prior))
    assert r2.stats.get("resumed") is True
    # ...a different blocklist rebuilds (blocked1 passes the gate now)
    r3 = build_training_corpus(
        rd.from_pandas(df), out_dir=out, near_threshold=0.5, bands=32,
        min_rows_per_file=1000, strip_markup=True,
        blocklist=["other.example"],
        reference_ds=rd.from_pandas(prior))
    assert not r3.stats.get("resumed")
    assert r3.n_input == 46


def test_corpus_ppl_gate(ray_session, tmp_path):
    """ppl_keep applies the CCNet per-language tercile split inside the
    funnel: ~2/3 of gate-passing docs survive, tail docs are gone, and
    the manifest invalidates when the bucket set changes."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    w = 1.0 / (np.arange(60) + 1)
    w /= w.sum()
    rows = [{"doc_id": f"d{i:03d}", "lang": "en",
             "text": " ".join(rng.choice(vocab, size=30, p=w))}
            for i in range(90)]
    df = pd.DataFrame(rows)
    out = str(tmp_path / "ppl")
    r = build_training_corpus(
        rd.from_pandas(df, override_num_blocks=3), out_dir=out,
        near_threshold=0.5, bands=32, min_rows_per_file=1000,
        ppl_keep=("head", "middle"))
    assert r.n_input == 90
    # tercile split: keep ~60 of the 90 (t-digest rank tolerance)
    assert 52 <= r.n_quality_pass <= 68
    # same knobs resume; different bucket set rebuilds
    r2 = build_training_corpus(
        rd.from_pandas(df, override_num_blocks=3), out_dir=out,
        near_threshold=0.5, bands=32, min_rows_per_file=1000,
        ppl_keep=("head", "middle"))
    assert r2.stats.get("resumed") is True
    r3 = build_training_corpus(
        rd.from_pandas(df, override_num_blocks=3), out_dir=out,
        near_threshold=0.5, bands=32, min_rows_per_file=1000,
        ppl_keep=("head",))
    assert not r3.stats.get("resumed")
    assert r3.n_quality_pass < r.n_quality_pass


def test_corpus_c4_rules_stage(ray_session, tmp_path):
    """c4_rules applies the C4 line filters + page gates as a front-door
    stage: pages with drop phrases or too few sentences vanish before
    the count, javascript lines are cut from surviving docs, and the
    knob keys the resume manifest."""
    def shape(t):
        w = t.split()
        return "\n".join(" ".join(w[i:i + 4]) + "."
                         for i in range(0, len(w), 4))

    df = corpus_df()
    df["text"] = df["text"].map(shape)   # period-terminated 4-word lines
    df = pd.concat([df, pd.DataFrame([
        # page gate: drop phrase
        {"doc_id": "lorem1",
         "text": shape(" ".join(f"tok{i}" for i in range(24)))
                 + "\nlorem ipsum filler."},
        # line filter: the javascript line is cut, the page survives
        {"doc_id": "jsdoc",
         "text": shape(" ".join(f"word{i}" for i in range(24)))
                 + "\nEnable javascript to proceed."},
    ])], ignore_index=True)
    out = str(tmp_path / "c4corpus")
    r = build_training_corpus(rd.from_pandas(df), out_dir=out,
                              near_threshold=0.5, bands=32,
                              min_rows_per_file=1000, c4_rules=True)
    # 47 in: junk2 (3 lines → <5 sentences) and lorem1 gone pre-count
    assert r.n_input == 45
    assert r.n_quality_pass == 44          # junk1 fails the quality gate
    assert r.n_after_exact_dedup == 43     # dup2 merges into dup1
    assert r.n_after_near_dedup == 42      # near1 merges too
    written = pq.read_table(os.path.join(out, "data")).to_pandas()
    ids = set(written["doc_id"])
    assert "lorem1" not in ids and "junk2" not in ids
    assert "jsdoc" in ids
    js_text = written[written["doc_id"] == "jsdoc"]["text"].iloc[0]
    assert "javascript" not in js_text.lower()
    assert js_text.endswith("word23.")    # clean lines byte-preserved
    # resume honors the knob: same call resumes, flipping it rebuilds
    r2 = build_training_corpus(rd.from_pandas(df), out_dir=out,
                               near_threshold=0.5, bands=32,
                               min_rows_per_file=1000, c4_rules=True)
    assert r2.stats.get("resumed") is True
    r3 = build_training_corpus(rd.from_pandas(df), out_dir=out,
                               near_threshold=0.5, bands=32,
                               min_rows_per_file=1000)
    assert not r3.stats.get("resumed")


def test_unicode_normalize_knob_collapses_encodings(ray_session, tmp_path):
    """Byte-distinct encodings of identical content survive the default
    funnel as distinct docs but collapse in exact dedup once the
    normalize_unicode knob canonicalizes them; the manifest keys the
    knob, so a changed form invalidates resume."""
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.pipelines.corpus import build_training_corpus

    base = ("a perfectly reasonable quality document with enough words "
            "to pass the gate and some more text to be safe here")
    df = pd.DataFrame({
        "doc_id": ["d1", "d2", "d3"],
        "text": [base + " café society",   # decomposed é
                 base + " café society",    # precomposed é
                 base + " entirely different tail content"],
        "lang": ["en"] * 3, "source": ["w"] * 3})
    ds = rd.from_pandas(df)
    plain = build_training_corpus(ds, out_dir=None)
    normed = build_training_corpus(ds, out_dir=None,
                                   normalize_unicode="NFC")
    assert plain.n_after_exact_dedup == 3
    assert normed.n_after_exact_dedup == 2

    out = str(tmp_path / "corpus_uni")
    r1 = build_training_corpus(ds, out_dir=out, normalize_unicode="NFC")
    r2 = build_training_corpus(ds, out_dir=out, normalize_unicode="NFC")
    assert r2.stats.get("resumed") is True
    r3 = build_training_corpus(ds, out_dir=out, normalize_unicode=None)
    assert not r3.stats.get("resumed")
    assert r1.n_after_exact_dedup == 2 and r3.n_after_exact_dedup == 3


def test_funnel_respects_text_col(ray_session):
    """The quality gate must score the configured text column, not a
    hardcoded 'text' (which used to KeyError — or worse, silently score
    a stray unrelated column)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.pipelines.corpus import build_training_corpus

    rng = np.random.default_rng(3)
    good = [" ".join(f"w{rng.integers(0, 50)}" for _ in range(30))
            for _ in range(20)]
    df = pd.DataFrame({
        "doc_id": range(22),
        "content": good + ["", "!!!!"],      # 2 quality failures
        "text": ["decoy"] * 22,              # stray unrelated column
    })
    r = build_training_corpus(rd.from_pandas(df), text_col="content",
                              key_col="doc_id")
    assert r.n_input == 22
    assert r.n_quality_pass == 20


def test_resume_invalidates_on_decontaminate_ngram(ray_session, tmp_path):
    """A rerun with a different decontamination n-gram must rebuild,
    not serve the stale manifest."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.pipelines.corpus import build_training_corpus

    rng = np.random.default_rng(4)
    docs = pd.DataFrame({
        "doc_id": range(12),
        "text": [" ".join(f"w{rng.integers(0, 40)}" for _ in range(25))
                 for _ in range(12)]})
    bench = pd.DataFrame({"doc_id": [99], "text": [docs["text"][0]]})
    out = str(tmp_path / "corpus")
    a = build_training_corpus(rd.from_pandas(docs), out_dir=out,
                              benchmark_ds=rd.from_pandas(bench),
                              decontaminate_ngram=8)
    b = build_training_corpus(rd.from_pandas(docs), out_dir=out,
                              benchmark_ds=rd.from_pandas(bench),
                              decontaminate_ngram=8)
    assert b.stats.get("resumed") is True
    c = build_training_corpus(rd.from_pandas(docs), out_dir=out,
                              benchmark_ds=rd.from_pandas(bench),
                              decontaminate_ngram=5)
    assert not c.stats.get("resumed")
    assert a.n_input == c.n_input


def test_keyless_benchmark_fingerprint(ray_session, tmp_path):
    """A text-only benchmark set (no doc_id) is legal: decontamination
    never needs its key, so the sink fingerprint must not require it."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cerberus_ray.pipelines.corpus import build_training_corpus

    rng = np.random.default_rng(5)
    docs = pd.DataFrame({
        "doc_id": range(10),
        "text": [" ".join(f"w{rng.integers(0, 40)}" for _ in range(25))
                 for _ in range(10)]})
    bench = pd.DataFrame({"text": [docs["text"][1]]})  # keyless
    r = build_training_corpus(rd.from_pandas(docs),
                              out_dir=str(tmp_path / "c"),
                              benchmark_ds=rd.from_pandas(bench))
    assert r.n_input == 10
