"""Vectorized string / temporal scalar kernels.

Each function re-expresses a reference scalar helper as an Arrow-native
vectorized kernel with IDENTICAL semantics, verified by the ported
reference test vectors in tests/test_strings.py:

- classify_contact   ≙ Contact.type regex cascade
                       (cerberus/models/contact.py:24-26,48-61)
- is_valid_email     ≙ mailto validate_email gate
                       (cerberus/templatetags/string_utils.py:10-17)
- linebreakto        ≙ string_utils.linebreakto (splitlines→join, :19-22)
- unslug             ≙ string_utils.unslug (:24-26)
- minimize_whitespace≙ utils.minimize_whitespace (regex strip, utils.py:27-31)
- make_aware_utc     ≙ utils.make_aware (date→aware datetime, idempotent,
                       utils.py:17-24)
- round_time_10min   ≙ BookingSlot.round_date_time (floor minute%10,
                       cerberus/models/booking.py:66-70)
- strip_title        ≙ anonymise title regex (anonymise.py:23-30)
- name_concat        ≙ Customer.name GeneratedField Concat
                       (cerberus/models/customer.py:76-80)
- truncate           ≙ name[:255] (cerberus/models/booking.py:340,349,358)

All operate on pa.Array/ChunkedArray and return Arrow arrays; regexes are
RE2 (pyarrow.compute), applied columnwise — no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# anchored like Python re.match (prefix) in the reference
EMAIL_RE = r"^[^@]+@[^@]+\.[^@]+"
MOBILE_RE = r"^(\+447|\(?07)[0-9\(\)\s]+$"
PHONE_RE = r"^\+?[0-9\(\)\s]+$"
# pragmatic full-string email validity (mailto gate)
VALID_EMAIL_RE = r"^[^@\s]+@[^@\s]+\.[^@\s]+$"
TITLE_RE = r"(?i)^(Sir|Madam|Mr|Mrs|Ms|Miss|Dr|Professor)\s+"


def _arr(x) -> pa.ChunkedArray | pa.Array:
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return x
    return pa.array(list(x), type=pa.string())


def classify_contact(details) -> pa.Array:
    """'email' | 'mobile' | 'phone' | 'unknown' per value (cascade order
    matters: email, then mobile, then phone)."""
    a = _arr(details)
    a_filled = pc.fill_null(a, "")
    is_email = pc.match_substring_regex(a_filled, EMAIL_RE)
    is_mobile = pc.match_substring_regex(a_filled, MOBILE_RE)
    is_phone = pc.match_substring_regex(a_filled, PHONE_RE)
    out = pc.if_else(
        is_email, pa.scalar("email"),
        pc.if_else(is_mobile, pa.scalar("mobile"),
                   pc.if_else(is_phone, pa.scalar("phone"),
                              pa.scalar("unknown"))))
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def is_valid_email(values) -> pa.Array:
    a = pc.fill_null(_arr(values), "")
    return pc.match_substring_regex(a, VALID_EMAIL_RE)


#: the FULL str.splitlines() break set (the reference is literally
#: ``to.join(input.splitlines())``, string_utils.py:20-21): \v \f and
#: the FS/GS/RS separators, NEL and the U+2028/U+2029 line separators
#: split there too — web-scraped text hits them
_LINE_BREAKS = "\n\r\v\f\x1c\x1d\x1e\x85\u2028\u2029"


def linebreakto(values, to: str) -> pa.Array:
    """splitlines→join semantics: one trailing line break is dropped, the
    remaining breaks become ``to`` (byte-identical to the reference's
    to.join(x.splitlines()) on every splitlines codepoint — tested)."""
    a = _arr(values)
    a = pc.replace_substring_regex(
        a, pattern=r"(\r\n|[" + _LINE_BREAKS + r"])$", replacement="",
        max_replacements=1)
    return pc.replace_substring_regex(
        a, pattern=r"(\r\n|[" + _LINE_BREAKS + r"])", replacement=to)


def unslug(values) -> pa.Array:
    return pc.replace_substring(_arr(values), pattern="_", replacement=" ")


def minimize_whitespace(values) -> pa.Array:
    """Strip leading per-line whitespace and all \\n/\\r, then trim."""
    a = _arr(values)
    a = pc.replace_substring_regex(a, pattern=r"(?m)(^[ \t\f\v]+|[\n\r]+)",
                                   replacement="")
    return pc.utf8_trim_whitespace(a)


def make_aware_utc(values) -> pa.Array:
    """date32 / naive timestamp → UTC-aware timestamp; idempotent on
    tz-aware input (the reference catches the double-aware ValueError)."""
    a = _arr(values)
    t = a.type
    if pa.types.is_date(t):
        a = pc.cast(a, pa.timestamp("us"))
        t = a.type
    if pa.types.is_timestamp(t) and t.tz is None:
        return pc.assume_timezone(a, "UTC")
    return a


def round_time_10min(values) -> pa.Array:
    """Floor to the 10-minute grid, dropping seconds/µs."""
    return pc.floor_temporal(_arr(values), multiple=10, unit="minute")


def strip_title(values) -> pa.Array:
    return pc.replace_substring_regex(_arr(values), pattern=TITLE_RE,
                                      replacement="", max_replacements=1)


def split_name(values):
    """title-stripped full name → (first, other, last) arrays
    (anonymise.py:26-30 name_parts split: first, middle-joined, last).

    Not a hot-path kernel (normalization of small dimension tables);
    per-row split mirrors the reference's ``split(" ")`` exactly."""
    stripped = strip_title(values)
    py = [p.split(" ") if p is not None else [""]
          for p in stripped.to_pylist()]
    first = pa.array([p[0] for p in py], type=pa.string())
    other = pa.array([" ".join(p[1:-1]) if len(p) > 2 else "" for p in py],
                     type=pa.string())
    last = pa.array([p[-1] for p in py], type=pa.string())
    return first, other, last


def name_concat(first, last) -> pa.Array:
    """Django ``Concat`` semantics: 'will never have a null result' —
    each null part coerces to '' (customer.py:77 GeneratedField), so
    the stored==recomputed parity rule holds on rows with a null part
    instead of comparing a value against null."""
    return pc.binary_join_element_wise(
        _arr(first), _arr(last), " ",
        null_handling="replace", null_replacement="")


def truncate(values, n: int = 255) -> pa.Array:
    return pc.utf8_slice_codeunits(_arr(values), 0, n)


def age_humanize(dob, today) -> pa.Array:
    """M26: humanized age from date-of-birth (cerberus/models/pet.py:97-101
    ``naturaldelta(now - dob)``; null dob → "Unknown").

    Vectorized re-implementation of humanize.naturaldelta's whole-day
    branch (the reference always passes date differences): <1 day →
    "a moment"; days → "a day"/"N days"; months (30.5-day buckets) →
    "a month"/"N months"; one year → "a year" / "1 year, N days" /
    "1 year, 1 month" / "1 year, N months"; else "N years".
    """
    import numpy as np

    arr = _arr(dob)
    days_arr = pc.days_between(arr, pa.scalar(today, type=pa.date32()))
    d = days_arr.to_numpy(zero_copy_only=False)
    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    d = np.where(valid, d, 0).astype(np.int64)
    d = np.abs(d)
    years = d // 365
    rem_days = d % 365
    months = (rem_days / 30.5).astype(np.int64)

    out = np.full(len(d), "Unknown", dtype=object)
    m = valid & (years == 0) & (d < 1)
    out[m] = "a moment"
    m = valid & (years == 0) & (d == 1)
    out[m] = "a day"
    m = valid & (years == 0) & (d > 1) & (months == 0)
    out[m] = np.char.add(d[m].astype(str), " days")
    m = valid & (years == 0) & (months == 1)
    out[m] = "a month"
    m = valid & (years == 0) & (months > 1)
    out[m] = np.char.add(months[m].astype(str), " months")
    m = valid & (years == 1) & (months == 0) & (rem_days == 0)
    out[m] = "a year"
    m = valid & (years == 1) & (months == 0) & (rem_days > 0)
    # ngettext parity (humanize naturaldelta): singular at exactly 1 day
    out[m] = np.array([f"1 year, {x} day" if x == 1 else f"1 year, {x} days"
                       for x in rem_days[m]], dtype=object)
    m = valid & (years == 1) & (months == 1)
    out[m] = "1 year, 1 month"
    m = valid & (years == 1) & (months > 1)
    out[m] = np.array([f"1 year, {x} months" for x in months[m]], dtype=object)
    m = valid & (years > 1)
    out[m] = np.char.add(years[m].astype(str), " years")
    return pa.array(out, type=pa.string())


def nfc_normalize(values) -> pa.Array:
    """Unicode NFC normalization (canonical composition) — the encoding
    cleanup a web-scraped corpus needs before hashing/dedup (the same
    text in composed vs decomposed form must hash identically).

    Fast path: a string whose UTF-8 byte length equals its codepoint
    count is pure ASCII and NFC by definition — skipped without touching
    Python. Only the non-ASCII remainder goes through
    ``unicodedata.is_normalized`` (C-level check) and, for the strings
    that actually need it, ``unicodedata.normalize``. DuckDB's
    ``nfc_normalize`` is the byte-exact oracle (tested)."""
    import unicodedata

    import numpy as np

    arr = _arr(values)
    ascii_mask = pc.equal(pc.binary_length(arr), pc.utf8_length(arr))
    need = pc.fill_null(pc.invert(ascii_mask), False).to_numpy(
        zero_copy_only=False)
    if not need.any():
        return arr
    vals = arr.to_numpy(zero_copy_only=False).astype(object)
    idx = np.flatnonzero(need)
    for i in idx:
        s = vals[i]
        if s is not None and not unicodedata.is_normalized("NFC", s):
            vals[i] = unicodedata.normalize("NFC", s)
    return pa.array(vals, type=pa.string())
