"""Reference-parity string kernel tests: vectors ported verbatim from the
reference suite (cerberus/tests/test_contacts.py:15-61,
test_utils.py:37-107, test_string_utils.py) plus hypothesis email
property (test_contacts.py:64-67)."""

from datetime import date, datetime, timezone
from itertools import product

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_ray.functions import strings as S

PHONES = ["+441234567890", "01234567890", "(01234)567890", "01234 567890"]
MOBILES = ["+447234567890", "07234567890", "(07234)567890", "07234 567890"]
EMAIL_NAMES = ["blueberry1234", "sunflower_87", "pineapplemaster456",
               "techwizard789", "rainbowsparkle22"]
EMAIL_DOMAINS = ["example.com", "mail.co.uk", "hotmail.fr", "gmail.net",
                 "yahoo.co.jp"]


@pytest.mark.parametrize("number", PHONES)
def test_phone_type(number):
    assert S.classify_contact([number])[0].as_py() == "phone"


@pytest.mark.parametrize("number", MOBILES)
def test_mobile_type(number):
    assert S.classify_contact([number])[0].as_py() == "mobile"


@pytest.mark.parametrize("name,domain", product(EMAIL_NAMES, EMAIL_DOMAINS))
def test_email_type(name, domain):
    assert S.classify_contact([f"{name}@{domain}"])[0].as_py() == "email"


@settings(max_examples=50, deadline=None, derandomize=True)
@given(st.emails())
def test_more_email_type(email):
    assert S.classify_contact([email])[0].as_py() == "email"


def test_unknown_type():
    out = S.classify_contact(["hello world", "", None]).to_pylist()
    assert out == ["unknown", "unknown", "unknown"]


def test_cascade_vectorized():
    out = S.classify_contact(
        ["a@b.com", "07234567890", "+441234567890", "xyz"]).to_pylist()
    assert out == ["email", "mobile", "phone", "unknown"]


# -- minimize_whitespace (test_utils.py:61-107) -----------------------------

@pytest.mark.parametrize("value,expected", [
    ("    This is a test string", "This is a test string"),
    ("This is a test string    ", "This is a test string"),
    ("This is a test\nstring", "This is a teststring"),
    ("This is a test\rstring", "This is a teststring"),
    ("This is a test\n\nstring", "This is a teststring"),
    ("This is a test\r\rstring", "This is a teststring"),
    ("", ""),
])
def test_minimize_whitespace(value, expected):
    assert S.minimize_whitespace([value])[0].as_py() == expected


# -- linebreakto / unslug / mailto (test_string_utils.py) -------------------

@pytest.mark.parametrize("value,to,expected", [
    ("Hello world!", "<br>", "Hello world!"),
    ("Hello\nworld\n!", "<br>", "Hello<br>world<br>!"),
    ("", "<br>", ""),
    ("Hello\nworld\n!", ", ", "Hello, world, !"),
    ("Hello world!\n", "<br>", "Hello world!"),
    ("\n\n\n", "<br>", "<br><br>"),
])
def test_linebreakto(value, to, expected):
    assert S.linebreakto([value], to)[0].as_py() == expected


def test_unslug():
    assert S.unslug(["hello_world_x"])[0].as_py() == "hello world x"


def test_valid_email_gate():
    out = S.is_valid_email(["test@example.com", "not an email", ""]).to_pylist()
    assert out == [True, False, False]


# -- make_aware (test_utils.py:37-58) ---------------------------------------

def test_make_aware_accepts_dates():
    a = pa.array([date(2022, 1, 1)], type=pa.date32())
    out = S.make_aware_utc(a)
    assert out[0].as_py() == datetime(2022, 1, 1, tzinfo=timezone.utc)


def test_make_aware_idempotent():
    a = pa.array([date(2022, 1, 1)], type=pa.date32())
    once = S.make_aware_utc(a)
    twice = S.make_aware_utc(once)
    assert once.equals(twice)


# -- 10-minute rounding (booking.py:66-70) ----------------------------------

def test_round_time_10min():
    a = pa.array([datetime(2022, 3, 4, 10, 17, 33, 123456),
                  datetime(2022, 3, 4, 10, 10, 0),
                  datetime(2022, 3, 4, 10, 9, 59)], type=pa.timestamp("us"))
    out = S.round_time_10min(a).to_pylist()
    assert out == [datetime(2022, 3, 4, 10, 10),
                   datetime(2022, 3, 4, 10, 10),
                   datetime(2022, 3, 4, 10, 0)]


# -- title strip / name split (anonymise.py:23-30) --------------------------

@pytest.mark.parametrize("value,expected", [
    ("Dr John Smith", "John Smith"),
    ("professor Jane A Doe", "Jane A Doe"),
    ("Madam X", "X"),
    ("Kevin No Title", "Kevin No Title"),
])
def test_strip_title(value, expected):
    assert S.strip_title([value])[0].as_py() == expected


def test_split_name():
    first, other, last = S.split_name(["Dr John Quincy Adams", "Cher"])
    assert first.to_pylist() == ["John", "Cher"]
    assert other.to_pylist() == ["Quincy", ""]
    assert last.to_pylist() == ["Adams", "Cher"]


# -- generated name / truncation (customer.py:76-80; booking.py:340) --------

def test_name_concat():
    out = S.name_concat(["Ada"], ["Lovelace"])
    assert out[0].as_py() == "Ada Lovelace"


def test_name_concat_null_parts_like_django_concat():
    # Django Concat never yields null: null parts coerce to ''
    out = S.name_concat(["Jo", None, None], ["Smith", "Smith", None])
    assert out.to_pylist() == ["Jo Smith", " Smith", " "]


def test_truncate():
    assert S.truncate(["x" * 300], 255)[0].as_py() == "x" * 255


def test_registry_contains_all():
    from cerberus_ray.functions.registry import FUNCTIONS, get, register

    for n in ["classify_contact", "minimize_whitespace", "unslug",
              "round_time_10min", "name_concat"]:
        assert n in FUNCTIONS

    @register("my_custom")
    def my_custom(x):
        return x

    assert get("my_custom") is my_custom


def test_age_humanize_vectors():
    """M26 (pet.py:97-101): naturaldelta whole-day branch vectors."""
    from datetime import date

    import pyarrow as pa

    from cerberus_ray.functions.strings import age_humanize

    today = date(2024, 3, 4)
    dobs = pa.array([
        None,                      # Unknown
        date(2024, 3, 4),          # a moment
        date(2024, 3, 3),          # a day
        date(2024, 2, 20),         # 13 days
        date(2024, 1, 25),         # a month (39 days -> 1 bucket)
        date(2023, 11, 1),         # 4 months
        date(2023, 3, 5),          # 365 days -> a year
        date(2023, 3, 4),          # 366 days -> 1 year, 1 day (ngettext
                                   # singular — naturaldelta parity)
        date(2023, 2, 28),         # 370 days -> 1 year, 5 days
        date(2023, 2, 1),          # 1 year, 1 month
        date(2022, 9, 1),          # 1 year, 6 months
        date(2019, 3, 1),          # 5 years
    ], type=pa.date32())
    got = age_humanize(dobs, today).to_pylist()
    assert got == ["Unknown", "a moment", "a day", "13 days", "a month",
                   "4 months", "a year", "1 year, 1 day", "1 year, 5 days",
                   "1 year, 1 month", "1 year, 6 months", "5 years"]
