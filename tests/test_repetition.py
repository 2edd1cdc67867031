"""Repetition signals (Gopher within-doc family): hand-computed vectors,
a per-doc pure-Python reference over random docs, and the sf0.001 pin."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines.text import repetition_signals


def ref_signals(text: str) -> dict:
    """Per-doc reference: the spec in words, computed the slow way."""
    lines = [l.strip() for l in text.split("\n")]
    lines = [l for l in lines if l != ""]
    occ = Counter(lines)
    n_lines = len(lines)
    dup_lines = sum(n - 1 for n in occ.values())
    tot_chars = sum(len(l) for l in lines)
    dup_chars = sum((n - 1) * len(l) for l, n in occ.items())
    toks = text.lower().split()
    bigr = Counter(zip(toks, toks[1:]))
    top_cov = max((n * (len(a) + len(b)) for (a, b), n in bigr.items()),
                  default=0)
    tok_chars = sum(len(t) for t in toks)

    def r4(x):
        return float(np.floor(x * 1e4 + 0.5) / 1e4)

    dlf = r4(dup_lines / max(n_lines, 1))
    t2 = r4(top_cov / max(tok_chars, 1))
    return {"n_lines": n_lines,
            "dup_line_frac": dlf,
            "dup_line_char_frac": r4(dup_chars / max(tot_chars, 1)),
            "top2gram_char_frac": t2,
            "rep_flag": dlf > 0.30 or t2 > 0.20}


def rand_docs(n=60, seed=5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(30)] + ["aa", "bb", "longerword"]
    rows = []
    for i in range(n):
        n_lines = rng.integers(0, 8)
        lines = []
        for _ in range(n_lines):
            lines.append(" ".join(rng.choice(words,
                                             size=rng.integers(1, 9))))
        if rng.random() < 0.4 and lines:       # inject line repeats
            lines.append(lines[0])
        if rng.random() < 0.2:
            lines.append("")                   # blank lines
        rows.append({"doc_id": f"d{i}", "text": "\n".join(lines)})
    return pd.DataFrame(rows)


def test_hand_vectors(ray_session):
    df = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["x\nx\ny",            # one duplicated line
                 "a b c d",            # no repeats, 4 tokens
                 "go go go go",        # 'go go' covers 3×4 chars... overlaps
                 ""]})                 # empty doc
    out = (repetition_signals(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id"))
    a = out.loc["a"]
    assert a["n_lines"] == 3 and a["dup_line_frac"] == 0.3333
    assert a["dup_line_char_frac"] == 0.3333
    # tokens x x y: top bigram 'x x' covers 2 of 3 token chars
    assert a["top2gram_char_frac"] == 0.6667
    assert bool(a["rep_flag"])
    b = out.loc["b"]
    assert b["dup_line_frac"] == 0.0
    assert b["top2gram_char_frac"] == 0.5   # 'a b' ×1 → 2/4
    c = out.loc["c"]
    # 'go go' ×3 (overlapping pairs) → 3*4=12 / 8 capped? no cap: 1.5
    assert c["top2gram_char_frac"] == 1.5
    d = out.loc["d"]
    assert d["n_lines"] == 0 and d["dup_line_frac"] == 0.0
    assert d["top2gram_char_frac"] == 0.0 and not bool(d["rep_flag"])


def test_matches_reference_on_random_docs(ray_session):
    df = rand_docs()
    out = (repetition_signals(rd.from_pandas(df, override_num_blocks=4))
           .to_pandas().set_index("doc_id"))
    for _, r in df.iterrows():
        exp = ref_signals(r["text"])
        got = out.loc[r["doc_id"]]
        for k, v in exp.items():
            if isinstance(v, float):
                assert got[k] == pytest.approx(v, abs=1e-9), (r["doc_id"], k)
            else:
                assert got[k] == v, (r["doc_id"], k)


def test_sf0001_pin(ray_session):
    from cerberus_ray.pipelines.training_queries import q_doc_repetition
    t = q_doc_repetition("/root/testdata/sf0.001").to_pydict()
    assert t == {"n_docs": [500], "n_flagged": [19],
                 "mean_dup_line_frac": [0.0],
                 "mean_top2gram_char_frac": [0.0889]}
