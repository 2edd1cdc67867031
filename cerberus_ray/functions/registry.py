"""Scalar-function registry — the engine's template-tag/filter surface
(reference: @register.filter/tag in cerberus/templatetags/*.py; SURVEY.md
§2.9). Custom kernels register by name and become usable in rule
expressions and normalize stages."""

from __future__ import annotations

from typing import Callable, Dict

from . import strings as S

FUNCTIONS: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn: Callable) -> Callable:
        FUNCTIONS[name] = fn
        return fn

    return deco


def get(name: str) -> Callable:
    return FUNCTIONS[name]


for _n, _f in [
    ("classify_contact", S.classify_contact),
    ("is_valid_email", S.is_valid_email),
    ("linebreakto", S.linebreakto),
    ("unslug", S.unslug),
    ("minimize_whitespace", S.minimize_whitespace),
    ("make_aware_utc", S.make_aware_utc),
    ("round_time_10min", S.round_time_10min),
    ("strip_title", S.strip_title),
    ("name_concat", S.name_concat),
    ("truncate", S.truncate),
]:
    FUNCTIONS[_n] = _f
