"""Small text/value sanitizers.

Reference: root schema.py:74-131 — ``_clean_string_values`` strips
newlines before sending schema text to an LLM; ``_value_sanitize`` drops
oversized lists (> LIST_LIMIT) and recurses into dicts when formatting
sampled values.
"""

from __future__ import annotations

from typing import Any

LIST_LIMIT = 128  # reference schema.py:28


def clean_string_values(text: str) -> str:
    """Strip newlines (reference schema.py:74-78)."""
    return text.replace("\n", " ").replace("\r", " ")


def value_sanitize(d: Any) -> Any:
    """Drop lists longer than LIST_LIMIT and recurse into dicts/lists
    (reference schema.py:81-131) — used when formatting sampled property
    values for prompt context."""
    if isinstance(d, dict):
        out = {}
        for k, v in d.items():
            s = value_sanitize(v)
            if s is not None:
                out[k] = s
        return out
    if isinstance(d, list):
        if len(d) > LIST_LIMIT:
            return None
        return [s for s in (value_sanitize(v) for v in d) if s is not None]
    return d
