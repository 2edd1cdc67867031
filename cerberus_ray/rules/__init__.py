from .core import Rule, RuleSet, ruleset_hash  # noqa: F401
