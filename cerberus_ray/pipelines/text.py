"""Text-analysis operators for training-data pipelines.

- token counting: whitespace split + a BPE-ish regex subword count
- language ID: stopword-hit heuristic over small built-in wordlists
  (n-gram/function-word language identification, Cavnar & Trenkle 1994
  style — deterministic, no external models)
- quality scoring: length / punctuation / stopword / digit / repetition
  ratios (the heuristic-filter family of public corpus pipelines, e.g.
  Gopher/C4 rules)
- fingerprinting: rolling-hash winnowing (Schleimer et al. 2003)

All stages are map_batches-vectorized where the kernel allows; the regex
is compiled once per actor via a callable class (actor-pool pattern).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from ..determinism import hash_strings, round_away

# tiny built-in function-word lists (public common words)
_STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the of and to in a is that it for on with as are was be "
                    "this have from or by not at an they which you had".split()),
    "de": frozenset("der die das und ist in den von zu mit sich des auf für "
                    "nicht eine als auch es an werden aus er".split()),
    "fr": frozenset("le la les de des et en un une du est que pour dans ce "
                    "il qui ne sur se pas plus par avec".split()),
    "es": frozenset("el la los las de y en un una del es que por para con no "
                    "se su al lo como más pero sus le".split()),
}

#: RE2 patterns shared verbatim with the DuckDB doc_quality oracle
#: (training_queries.py) — the pattern IS the contract, same trick as
#: doc_pii_scan. Evaluated via pyarrow (RE2) on BOTH sides, never Python
#: re, so unicode \w/\s semantics cannot drift between engine and oracle.
SUBWORD_RE = r"\w+|[^\w\s]"
PUNCT_RE = r"[^\w\s]"
DIGIT_RE = r"\d"


def _round4(s: pd.Series) -> pd.Series:
    """Round-half-away-from-zero to 4 dp (DuckDB ROUND semantics) for
    non-negative ratios; numpy/pandas .round is half-even, which diverges
    on exactly-representable dyadic ties like 1/32 = 0.03125."""
    return np.floor(s.to_numpy(dtype="float64") * 1e4 + 0.5) / 1e4


class TextScorer:
    """Actor-pool stage: regexes compiled once per actor (__init__), scoring
    per batch (__call__) — the ST2 lru_cache pattern lifted to actors
    (reference: cerberus/utils.py:27-31)."""

    def __init__(self):
        self.stop = _STOPWORDS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        texts = batch["text"].fillna("")
        low = texts.str.lower()
        tokens = low.str.split()
        n_tokens = tokens.str.len().fillna(0).astype("int64")
        n_chars = texts.str.len().astype("int64")
        arr, arr_low = pa.array(texts, pa.string()), pa.array(low, pa.string())
        n_subwords = pc.count_substring_regex(arr_low, SUBWORD_RE).to_pandas().astype("int64")
        n_punct = pc.count_substring_regex(arr, PUNCT_RE).to_pandas().astype("int64")
        n_digit = pc.count_substring_regex(arr, DIGIT_RE).to_pandas().astype("int64")
        n_subwords.index = n_punct.index = n_digit.index = batch.index
        en = self.stop["en"]
        # vectorized token stats: one explode + grouped reductions instead
        # of a Python lambda per document (the former hot cost of this
        # stage); empty docs reindex to 0
        ex = tokens.explode().dropna()
        denom = n_tokens.clip(lower=1)
        if len(ex):
            grp_idx = ex.index
            stop_hits = ex.isin(en).groupby(grp_idx).sum()
            uniq = ex.groupby(grp_idx).nunique()
            tok_len = ex.str.len().groupby(grp_idx).mean()
        else:
            stop_hits = uniq = tok_len = pd.Series(dtype=float)
        idx = batch.index
        stop_ratio = stop_hits.reindex(idx).fillna(0) / denom
        uniq_ratio = uniq.reindex(idx).fillna(0) / denom
        mean_word_len = tok_len.reindex(idx).fillna(0.0)
        out = batch[[c for c in batch.columns if c != "text"]].copy()
        out["n_chars"] = n_chars
        out["n_tokens"] = n_tokens
        out["n_subwords"] = n_subwords
        out["punct_ratio"] = _round4(n_punct / n_chars.clip(lower=1))
        out["digit_ratio"] = _round4(n_digit / n_chars.clip(lower=1))
        out["stopword_ratio"] = _round4(stop_ratio.astype(float))
        out["unique_token_ratio"] = _round4(uniq_ratio.astype(float))
        out["mean_word_len"] = _round4(mean_word_len)
        # composite quality gate (Gopher-style heuristics)
        out["quality_pass"] = (
            (n_tokens >= 5) & (n_tokens <= 100_000)
            & (out["mean_word_len"].between(2, 12))
            & (out["punct_ratio"] < 0.3)
            & (out["unique_token_ratio"] > 0.1))
        return out


_SCORER_SINGLETON: dict = {}


def _score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    # per-worker-process singleton: task-pool stages re-instantiate per
    # task, but TextScorer's setup is a frozenset assignment — the
    # singleton only exists so the pattern scales to heavier state
    sc = _SCORER_SINGLETON.get("scorer")
    if sc is None:
        sc = _SCORER_SINGLETON["scorer"] = TextScorer()
    return sc(batch)


def _langid_batch(batch: pd.DataFrame) -> pd.DataFrame:
    li = _SCORER_SINGLETON.get("langid")
    if li is None:
        li = _SCORER_SINGLETON["langid"] = LangId()
    return li(batch)


def score_text(ds, *, concurrency=None, batch_size: int = 2048,
               num_cpus: float = 1, actors: bool = False):
    """Quality/stat scoring. Default is a TASK pool with a per-worker
    singleton: TextScorer's setup cost is one frozenset assignment, so
    an actor pool would pay ~1s of actor-process startup per execution
    for nothing (measured: kernel 0.3s, actor-pool query 1.6s). Pass
    actors=True for the ST2 actor-pool form — the right shape once
    setup means loading a model or compiling many patterns.
    ``concurrency`` caps in-flight tasks in BOTH forms (None = schedule
    by CPU in the task form)."""
    if actors:
        return ds.map_batches(TextScorer, batch_format="pandas",
                              batch_size=batch_size,
                              concurrency=concurrency or 4,
                              num_cpus=num_cpus)
    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(_score_batch, batch_format="pandas",
                          batch_size=batch_size, **kw)


class LangId:
    """Stopword-hit language classifier (actor-pool stage), vectorized:
    one explode + per-language isin/grouped sums instead of a Python
    classification call per document. The first-strict-max tie-break
    over dict order (en, de, fr, es) is applied as a reversed priority
    cascade — identical to the per-row reference implementation (kept in
    classify_tokens for the unit-vector tests)."""

    def __init__(self):
        self.stop = _STOPWORDS

    def classify_tokens(self, tokens: List[str]) -> str:
        """Scalar reference implementation (used by tests)."""
        if not tokens:
            return "unknown"
        joined = "".join(tokens)
        if any("一" <= c <= "鿿" for c in joined):
            return "zh"
        best, best_hits = "unknown", 0
        for lang, words in self.stop.items():
            hits = sum(t in words for t in tokens)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        tokens = texts.str.lower().str.split()
        ex = tokens.explode().dropna()
        idx = batch.index
        hits = {}
        for lang, words in self.stop.items():
            if len(ex):
                h = ex.isin(words).groupby(ex.index).sum()
                hits[lang] = h.reindex(idx).fillna(0).to_numpy()
            else:
                hits[lang] = np.zeros(len(idx))
        h_en, h_de = hits["en"], hits["de"]
        h_fr, h_es = hits["fr"], hits["es"]
        pred = np.full(len(idx), "unknown", dtype=object)
        pred[h_en >= 1] = "en"
        pred[h_de > h_en] = "de"
        pred[h_fr > np.maximum(h_en, h_de)] = "fr"
        pred[h_es > np.maximum(h_fr, np.maximum(h_en, h_de))] = "es"
        # CJK heuristic overrides (rare): any han character
        cjk = texts.str.contains("[一-鿿]", regex=True, na=False).to_numpy()
        pred[cjk & (tokens.str.len().fillna(0) > 0).to_numpy()] = "zh"
        batch = batch.copy()
        batch["lang_pred"] = pred
        return batch


def lang_id(ds, *, concurrency=None, batch_size: int = 2048,
            num_cpus: float = 1, actors: bool = False):
    """Language ID. Task pool by default (see score_text for why);
    actors=True restores the actor-pool form; ``concurrency`` caps
    in-flight tasks in both forms."""
    if actors:
        return ds.map_batches(LangId, batch_format="pandas",
                              batch_size=batch_size,
                              concurrency=concurrency or 4,
                              num_cpus=num_cpus)
    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(_langid_batch, batch_format="pandas",
                          batch_size=batch_size, **kw)


# ---------------------------------------------------------------------------
# PII patterns + redaction
# ---------------------------------------------------------------------------

#: RE2 patterns shared verbatim with the doc_pii_scan DuckDB oracle and the
#: redaction parity tests (pattern-as-contract, same trick as SUBWORD_RE).
PII_EMAIL_RE = r"[^@\s]+@[^@\s]+\.[^@\s]+"
PII_PHONE_RE = r"(\+447|07)[0-9]{9}"


def redact_pii(ds, *, text_col: str = "text",
               email_token: str = "<EMAIL>", phone_token: str = "<PHONE>"):
    """Replace every email-like then phone-like substring with a fixed
    placeholder token — the removal complement of `doc_pii_scan` (public
    pipeline hygiene step; both sides are RE2: pyarrow here, DuckDB
    ``regexp_replace(..., 'g')`` in the parity test, so offsets and
    greediness cannot drift). Replacement order (emails first) is part of
    the contract. Stateless streamed pass; all other columns untouched."""
    import pyarrow.compute as pc

    def red(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b[text_col], "")
        t = pc.replace_substring_regex(t, PII_EMAIL_RE, email_token)
        t = pc.replace_substring_regex(t, PII_PHONE_RE, phone_token)
        i = b.schema.get_field_index(text_col)
        return b.set_column(i, text_col, t)

    return ds.map_batches(red, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# repetition signals (Gopher Appendix-A repetition filters)
# ---------------------------------------------------------------------------

def repetition_signals(ds, *, text_col: str = "text",
                       batch_size: int = 2048):
    """Per-document repetition statistics — the within-document repetition
    family of the Gopher quality rules (Rae et al. 2021, Table A1; the
    across-document complement lives in `line_dedup.py`):

    - ``dup_line_frac``: duplicated lines / total non-blank lines (a line
      counts as duplicated when the same stripped content occurs on an
      earlier line of the SAME doc)
    - ``dup_line_char_frac``: characters inside duplicated lines / total
      non-blank line characters
    - ``top2gram_char_frac``: characters covered by the most frequent
      word 2-gram / total token characters
    - ``rep_flag``: the Gopher gate (dup_line_frac > 0.30 or
      top2gram_char_frac > 0.20)

    Fully vectorized: one explode + two pandas groupby counts per batch —
    no per-document Python. Ratios use `_round4` half-away rounding (the
    shared oracle-parity convention)."""

    def signals(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        # --- line duplication -------------------------------------------
        lines = texts.str.split("\n").explode().str.strip()
        lines = lines[lines != ""]
        if len(lines):
            li = pd.DataFrame({"d": lines.index, "v": lines.to_numpy()})
            li["chars"] = li["v"].str.len()
            occ = li.groupby(["d", "v"], sort=False)["chars"].agg(
                n="count", c="first")
            n_lines = occ.groupby(level="d")["n"].sum()
            dup_lines = (occ["n"] - 1).groupby(level="d").sum()
            tot_chars = (occ["n"] * occ["c"]).groupby(level="d").sum()
            dup_chars = ((occ["n"] - 1) * occ["c"]).groupby(level="d").sum()
        else:
            n_lines = dup_lines = tot_chars = dup_chars = pd.Series(
                dtype="int64")
        idx = batch.index
        n_lines = n_lines.reindex(idx).fillna(0)
        dlf = dup_lines.reindex(idx).fillna(0) / n_lines.clip(lower=1)
        dcf = (dup_chars.reindex(idx).fillna(0)
               / tot_chars.reindex(idx).fillna(0).clip(lower=1))
        # --- top word-2-gram --------------------------------------------
        toks = texts.str.lower().str.split().explode().dropna()
        if len(toks):
            d = toks.index.to_numpy()
            v = toks.to_numpy(dtype=object).astype(str)
            same = d[:-1] == d[1:]          # pair stays inside its doc
            big_d = d[:-1][same]
            big_v = np.char.add(np.char.add(v[:-1][same], " "),
                                v[1:][same])
            bi = pd.DataFrame({"d": big_d, "v": big_v})
            bi["chars"] = bi["v"].str.len() - 1  # chars of the two words
            top = (bi.groupby(["d", "v"], sort=False)["chars"]
                   .agg(n="count", c="first").reset_index())
            top["cov"] = top["n"] * top["c"]
            top_cov = top.groupby("d")["cov"].max()
            tok_chars = pd.Series(
                np.char.str_len(v), index=d).groupby(level=0).sum()
        else:
            top_cov = tok_chars = pd.Series(dtype="int64")
        t2 = (top_cov.reindex(idx).fillna(0)
              / tok_chars.reindex(idx).fillna(0).clip(lower=1))
        out = batch[[c for c in batch.columns if c != text_col]].copy()
        out["n_lines"] = n_lines.astype("int64")
        out["dup_line_frac"] = _round4(dlf.astype(float))
        out["dup_line_char_frac"] = _round4(dcf.astype(float))
        out["top2gram_char_frac"] = _round4(t2.astype(float))
        out["rep_flag"] = ((out["dup_line_frac"] > 0.30)
                           | (out["top2gram_char_frac"] > 0.20))
        return out

    return ds.map_batches(signals, batch_format="pandas",
                          batch_size=batch_size)


# ---------------------------------------------------------------------------
# token counts (oracle-expressible subset)
# ---------------------------------------------------------------------------

def token_stats_by_lang(ds) -> pa.Table:
    """(lang, n_docs, total_tokens, avg_tokens) — whitespace tokens, which
    DuckDB can reproduce with string_split_regex (oracle parity)."""
    import pyarrow.compute as pc

    from ..stages.groupagg import grouped_agg

    def cnt(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.strip().str.split().str.len()
        return pd.DataFrame({"lang": b["lang"], "n_tokens": toks.astype("int64")})

    g = grouped_agg(ds.map_batches(cnt, batch_format="pandas"), ["lang"],
                    {"n_docs": ("", "count"),
                     "total_tokens": ("n_tokens", "sum"),
                     "avg_tokens": ("n_tokens", "mean")})
    t = pa.Table.from_pandas(g, preserve_index=False)
    return t.set_column(
        t.schema.get_field_index("avg_tokens"), "avg_tokens",
        pa.array(round_away(np.asarray(t["avg_tokens"]))))


# ---------------------------------------------------------------------------
# fingerprinting (winnowing)
# ---------------------------------------------------------------------------

def winnow_fingerprint(text: str, *, k: int = 5, window: int = 4) -> np.ndarray:
    """Winnowing fingerprint: k-gram rolling hashes → min per sliding window
    (unique, sorted). Deterministic; used for copy detection / fuzzy dedup."""
    t = (text or "").lower()
    if len(t) < k:
        return np.array([], dtype=np.uint64)
    grams = np.array([t[i:i + k] for i in range(len(t) - k + 1)], dtype=object)
    h = hash_strings(grams)
    if len(h) <= window:
        return np.unique(h)
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(sw.min(axis=1))


def _winnow_batch(texts, *, k: int, window: int):
    """Batch winnowing kernel: flatten every doc's k-grams, hash them in
    ONE vectorized hash_strings call (the per-doc variant paid a polars
    Series construction per document), then take per-doc sliding-window
    minima in numpy. Output identical to winnow_fingerprint per doc."""
    grams: list = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        tl = (t or "").lower()
        n = max(len(tl) - k + 1, 0)
        counts[i] = n
        if n:
            grams.extend(tl[j:j + k] for j in range(n))
    if grams:
        h = hash_strings(np.array(grams, dtype=object))
    else:
        h = np.array([], dtype=np.uint64)
    fps = []
    pos = 0
    for n in counts:
        seg = h[pos:pos + n]
        pos += n
        if n == 0:
            fps.append(np.array([], dtype=np.uint64))
        elif n <= window:
            fps.append(np.unique(seg))
        else:
            sw = np.lib.stride_tricks.sliding_window_view(seg, window)
            fps.append(np.unique(sw.min(axis=1)))
    return fps


def fingerprint_docs(ds, *, text_col: str = "text", key_col: str = "doc_id",
                     k: int = 5, window: int = 4):
    """→ Dataset (doc_id, n_grams, fingerprint: list<uint64 as int64>)."""

    def fp(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = batch[text_col].to_numpy(zero_copy_only=False)
        keys = pc.cast(batch[key_col], pa.string()).to_numpy(zero_copy_only=False)
        fps = [f.view(np.int64)
               for f in _winnow_batch(texts, k=k, window=window)]
        return pa.Table.from_pydict({
            "doc_id": pa.array(keys, type=pa.string()),
            "n_grams": pa.array([len(f) for f in fps], type=pa.int64()),
            "fingerprint": pa.array([f.tolist() for f in fps],
                                    type=pa.list_(pa.int64())),
        })

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def char_entropy(ds, *, text_col: str = "text", key_col: str = "doc_id"):
    """→ Dataset (doc_id, n_chars, distinct_chars, entropy_bits): Shannon
    entropy of each document's CHARACTER distribution — the classic
    gibberish/boilerplate signal (keyboard mash and repeated padding sit
    far below natural prose's ~4 bits/char; public corpus filters gate on
    it next to the Gopher rules and `compression_ratio`, which measures
    SEQUENCE redundancy rather than symbol spread).

    H = log2(n) − (Σ_c count_c·log2(count_c))/n over unicode CODEPOINTS
    (matching DuckDB's per-character `string_split(text, '')`, so the
    oracle is exact); empty/null docs get H = 0. `entropy_bits` rounds
    half-away to 4 dp (`_round4`, DuckDB ROUND semantics).

    Vectorized per batch: every text in the batch is decoded once into a
    single UTF-32 codepoint array, (doc, codepoint) pairs collapse with
    one `np.unique`, and the per-doc reductions are `np.bincount` — no
    per-document Python. Stateless, streams; the per-doc output rows make
    it a map stage, never an exchange."""
    import pyarrow.compute as pc

    def score(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b[text_col], "").to_pylist()
        n_docs = len(texts)
        lens = np.fromiter((len(t) for t in texts), np.int64, n_docs)
        cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                           dtype=np.uint32).astype(np.uint64)
        doc = np.repeat(np.arange(n_docs, dtype=np.uint64), lens)
        uk, counts = np.unique((doc << np.uint64(32)) | cp,
                               return_counts=True)
        udoc = (uk >> np.uint64(32)).astype(np.int64)
        distinct = np.bincount(udoc, minlength=n_docs).astype(np.int64)
        clogc = np.bincount(udoc, weights=counts * np.log2(counts),
                            minlength=n_docs)
        n = lens.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            h = np.where(lens > 0, np.log2(np.maximum(n, 1)) - clogc
                         / np.maximum(n, 1), 0.0)
        return pa.Table.from_pydict({
            "doc_id": b[key_col],
            "n_chars": pa.array(lens, pa.int64()),
            "distinct_chars": pa.array(distinct, pa.int64()),
            "entropy_bits": pa.array(_round4(pd.Series(h)), pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def compression_ratio(ds, *, text_col: str = "text",
                      key_col: str = "doc_id", level: int = 6,
                      round_digits: int = 4):
    """→ Dataset (doc_id, n_bytes, n_compressed, ratio): zlib
    compression ratio per document — the cheap low-entropy/boilerplate
    signal (highly repetitive machine-generated text compresses far
    better than natural prose; public pipelines gate on it alongside
    the Gopher repetition rules).

    ratio = compressed/raw bytes (smaller ⇒ more redundant); empty docs
    get ratio 1.0 by convention. Per-row zlib runs in C; the batch loop
    is bytes-bound like the winnowing kernel. Stateless, streams."""
    import zlib

    import pyarrow.compute as pc

    def score(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b[text_col], "").to_numpy(
            zero_copy_only=False)
        raw = np.empty(len(texts), np.int64)
        comp = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            enc = t.encode("utf-8", errors="surrogatepass")
            raw[i] = len(enc)
            comp[i] = len(zlib.compress(enc, level)) if enc else 0
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
        return pa.Table.from_pydict({
            "doc_id": b[key_col],
            "n_bytes": pa.array(raw, pa.int64()),
            "n_compressed": pa.array(comp, pa.int64()),
            "ratio": pa.array(np.round(ratio, round_digits), pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
