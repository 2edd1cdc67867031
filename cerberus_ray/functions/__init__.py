from .strings import (  # noqa: F401
    classify_contact,
    is_valid_email,
    linebreakto,
    make_aware_utc,
    minimize_whitespace,
    name_concat,
    round_time_10min,
    strip_title,
    truncate,
    unslug,
)
