"""URL canonicalization: exact agreement with an independent
urllib-based reference over hand vectors and randomized URLs,
idempotence, and the canonical-URL dedup report."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cerberus_ray.pipelines.webclean import (
    TRACKING_PARAM_RE,
    canonical_url_dup_report,
    canonicalize_url_array,
    canonicalize_urls,
)

_TRACK = re.compile(TRACKING_PARAM_RE)


def ref_canon(u):
    """Independent reference: same spec, urllib/stdlib implementation."""
    if u is None:
        return None
    s = u.strip()
    s = re.sub(r"#.*$", "", s)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?]*)"
                 r"(?:\?(.*))?$", s)
    if not m:
        return u
    scheme, host, path, q = m.groups()
    scheme, host = scheme.lower(), host.lower().rstrip(".")
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    if scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = path or "/"
    out = f"{scheme}://{host}{path}"
    if q:
        params = sorted(p for p in q.split("&")
                        if p and not _TRACK.match(p))
        if params:
            out += "?" + "&".join(params)
    return out


VECTORS = [
    "HTTPS://Example.COM:443/Path/One?b=2&utm_source=x&a=1#frag",
    "http://test.org:80",
    "http://test.org:8080/x",          # non-default port kept
    "https://a.b.C./x?",               # trailing host dot + empty query
    "  http://pad.io/p?z=1&z=0&y  ",   # whitespace, dup names, bare param
    "http://t.co/?fbclid=abc&gclid=1", # all params tracking → no '?'
    "ftp://Mixed.Case/Path:80?b=1&a=2",# other scheme: no port strip
    "not a url at all",
    "relative/path?utm_source=x#f",    # not absolute: untouched
    "http://x.io/a?utm_campaign",      # tracking param without value
    "https://x.io:443",                # port strip + empty path
    "",
    None,
]


def test_hand_vectors_match_reference():
    got = canonicalize_url_array(pa.array(VECTORS, pa.string())).to_pylist()
    want = [ref_canon(u) for u in VECTORS]
    assert got == want


def test_non_urls_pass_through_byte_exact():
    got = canonicalize_url_array(
        pa.array(["not a url at all", "relative/path?utm_source=x#f"]))
    assert got.to_pylist() == ["not a url at all",
                               "relative/path?utm_source=x#f"]


def test_randomized_reference_parity():
    rng = np.random.default_rng(7)
    schemes = ["http", "HTTP", "https", "HtTpS"]
    hosts = ["A.io", "x.Y.z:80", "q.org:443", "w.io:8080", "dot.io."]
    paths = ["", "/", "/a/B", "/a%20b"]
    params = ["a=1", "b=2", "utm_source=t", "fbclid=9", "", "c", "a=0"]
    urls = []
    for _ in range(300):
        q = "&".join(rng.choice(params,
                                size=rng.integers(0, 5)).tolist())
        urls.append(f"{rng.choice(schemes)}://{rng.choice(hosts)}"
                    f"{rng.choice(paths)}" + (f"?{q}" if q else "")
                    + (rng.choice(["", "#frag"])))
    got = canonicalize_url_array(pa.array(urls, pa.string())).to_pylist()
    assert got == [ref_canon(u) for u in urls]


def test_idempotent():
    once = canonicalize_url_array(pa.array(VECTORS, pa.string()))
    twice = canonicalize_url_array(once)
    assert once.to_pylist() == twice.to_pylist()


@pytest.fixture(scope="module")
def url_ds(ray_session):
    rows = [
        {"doc_id": 0, "url": "https://example.com/a?utm_source=x&b=1"},
        {"doc_id": 1, "url": "HTTPS://EXAMPLE.com:443/a?b=1"},   # dup of 0
        {"doc_id": 2, "url": "https://example.com/a?b=2"},       # distinct
        {"doc_id": 3, "url": "http://other.io/"},
        {"doc_id": 4, "url": "http://other.io:80?gclid=z"},      # dup of 3
        {"doc_id": 5, "url": "http://third.net/x"},
    ]
    return rd.from_pandas(pd.DataFrame(rows), override_num_blocks=3)


def test_canonical_url_dup_report(url_ds):
    out = canonical_url_dup_report(url_ds).to_pandas()
    got = dict(zip(out["canonical_url"], out["n"]))
    assert got == {"https://example.com/a?b=1": 2,
                   "http://other.io/": 2}


def test_canonicalize_urls_stage_modes(url_ds):
    inplace = canonicalize_urls(url_ds).to_pandas()
    appended = canonicalize_urls(url_ds, out_col="canon").to_pandas()
    assert "canon" in appended.columns and "url" in appended.columns
    a = appended.sort_values("doc_id")
    i = inplace.sort_values("doc_id")
    assert list(a["canon"]) == list(i["url"])
    assert list(a["url"]) != list(a["canon"])  # originals preserved
