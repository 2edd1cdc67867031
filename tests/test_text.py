"""Text analysis: scoring, language ID, fingerprinting, token stats."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cerberus_ray.pipelines import text as TX


@pytest.fixture(scope="module")
def docs(ray_session):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": list(range(6)),
        "text": [
            "The cat sat on the mat and it was happy with the sun.",
            "Der Hund ist in der Stadt und er will nicht nach Hause.",
            "Le chat est dans la maison et il ne veut pas sortir.",
            "El perro está en la casa y no quiere salir de la cama.",
            "你好 世界 这是 中文 文本",
            "!!! ??? ... ;;; :::",
        ],
    }))


def test_langid(docs):
    out = TX.lang_id(docs, concurrency=2).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist()[:5] == ["en", "de", "fr", "es", "zh"]


def test_scorer_stats(docs):
    out = TX.score_text(docs, concurrency=2).to_pandas().sort_values("doc_id")
    en = out.iloc[0]
    assert en["n_tokens"] == 13
    assert en["stopword_ratio"] > 0.2
    junk = out.iloc[5]
    assert not junk["quality_pass"]  # all punctuation
    assert bool(en["quality_pass"])


def test_scorer_deterministic(docs):
    a = TX.score_text(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = TX.score_text(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_winnow_fingerprint_locality():
    a = TX.winnow_fingerprint("the quick brown fox jumps over the lazy dog")
    b = TX.winnow_fingerprint("the quick brown fox jumps over the lazy cat")
    c = TX.winnow_fingerprint("entirely different content with nothing shared")
    assert len(a) > 0
    overlap_ab = len(np.intersect1d(a, b)) / max(len(np.union1d(a, b)), 1)
    overlap_ac = len(np.intersect1d(a, c)) / max(len(np.union1d(a, c)), 1)
    assert overlap_ab > 0.6
    assert overlap_ac < 0.1
    assert TX.winnow_fingerprint("").size == 0
    assert TX.winnow_fingerprint("ab").size == 0  # shorter than k


def test_fingerprint_docs(docs):
    out = TX.fingerprint_docs(docs).to_pandas()
    assert set(out.columns) == {"doc_id", "n_grams", "fingerprint"}
    assert (out["n_grams"] > 0).all()


def test_multimodal_plumbing(ray_session):
    from cerberus_ray.datagen import GenConfig, media_dataset
    from cerberus_ray.pipelines import multimodal as MM

    media = media_dataset(GenConfig(n_docs=1, n_media=50))
    feats = MM.decode_media(MM.synthesize_payloads(media), concurrency=2,
                            batch_size=16)
    pdf = feats.to_pandas()
    assert len(pdf) == 50
    assert set(pdf.columns) == {"media_ref", "kind", "n_bytes", "width",
                                "height", "n_frames", "decoder", "feature"}
    # every catalog kind carries a REAL stream (PNG / PCM WAV / Arrow
    # IPC) and decodes with the matching real kernel
    img = pdf["kind"] == "image"
    aud = pdf["kind"] == "audio"
    tab = pdf["kind"] == "table"
    assert (pdf.loc[img, "decoder"] == "png").all()
    assert (pdf.loc[aud, "decoder"] == "wav").all()
    assert (pdf.loc[tab, "decoder"] == "arrow").all()
    assert (pdf.loc[img, "n_frames"] == 1).all()
    assert (pdf.loc[aud, "width"] == 16_000).all()   # sample rate
    assert pdf.loc[aud, "height"].isin([1, 2]).all()  # channels
    assert (pdf.loc[tab, "width"] == 3).all()         # columns
    assert (pdf.loc[tab, "n_frames"] >= 2).all()      # rows
    assert (pdf["width"] >= 3).all()
    # deterministic across runs
    pdf2 = MM.decode_media(MM.synthesize_payloads(media), concurrency=2,
                           batch_size=16).to_pandas()
    a = pdf.sort_values("media_ref").reset_index(drop=True).drop(columns=["feature"])
    b = pdf2.sort_values("media_ref").reset_index(drop=True).drop(columns=["feature"])
    pd.testing.assert_frame_equal(a, b)
    # resize + frame-sample stubs
    resized = MM.resize_images(feats, target=64).to_pandas()
    assert (resized["width"] == 64).all()
    frames = MM.sample_frames(feats, every_n=10).to_pandas()
    assert (frames["frame_idx"] % 10 == 0).all()


def test_strict_decoder_raises():
    from cerberus_ray.pipelines.multimodal import MediaDecoder

    d = MediaDecoder(strict=True)
    with pytest.raises(NotImplementedError):
        d._decode_fake(b"xx", "image")


def test_langid_vectorized_matches_scalar(ray_session):
    """The vectorized batch classifier must agree with the scalar
    reference implementation on every row, including ties, empties,
    CJK, and mixed-language text."""
    import numpy as np
    import pandas as pd

    from cerberus_ray.pipelines.text import LangId

    rng = np.random.default_rng(7)
    li = LangId()
    rows = ["the cat sat on the mat", "der hund ist in den garten",
            "le chat est sur la table", "el perro es de la casa",
            "", "   ", "xyzzy plugh", "the der le el", "一些中文字",
            "the the the der der", None,
            "with the rain of the night der und le la el es"]
    for _ in range(50):
        words = rng.choice(["the", "der", "le", "el", "of", "und", "des",
                            "en", "la", "zz", "qq"], size=rng.integers(0, 12))
        rows.append(" ".join(words))
    df = pd.DataFrame({"text": rows})
    got = li(df.copy())["lang_pred"].tolist()
    want = [li.classify_tokens((t or "").lower().split()) for t in rows]
    assert got == want


def test_pii_scan_detects_patterns(ray_session, tmp_path):
    """The PII scan must actually fire on email/phone-bearing docs (the
    driver-fixture corpus contains none, so its oracle pass is vacuous —
    this is the non-vacuous detection check)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cerberus_ray.pipelines.training_queries import q_doc_pii_scan

    docs = pa.Table.from_pydict({
        "source": ["web", "web", "mail", "mail", "mail"],
        "text": ["nothing to see here",
                 "contact me at ada@example.com for details",
                 "call 07123456789 now",
                 "or +447123456789 later",
                 "misleading 0712 not a number"],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_doc_pii_scan(str(tmp_path)).to_pandas().set_index("source")
    assert out.loc["web", "n_docs"] == 2
    assert out.loc["web", "n_email"] == 1 and out.loc["web", "n_phone"] == 0
    assert out.loc["mail", "n_email"] == 0 and out.loc["mail", "n_phone"] == 2
