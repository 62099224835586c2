"""JSON repair corpus — ported from reference
tests/unit/.../test_entity_relation_extractor.py:232-421."""

from __future__ import annotations

import json

import pytest

from neo4j_graphrag_python_spark.functions.json_repair import (
    InvalidJSONError,
    balance_curly_braces,
    fix_invalid_json,
)


@pytest.mark.parametrize(
    "raw, expected",
    [
        ('{name: "John", age: "30"}', '{"name": "John", "age": "30"}'),
        ('{"name": John, "age": 30}', '{"name": "John", "age": 30}'),
        ('{"name": "John", "age": 30,}', '{"name": "John", "age": 30}'),
        ('{{"name": "John"}}', '{"name": "John"}'),
        (
            '{name: John, "hobbies": ["reading", "swimming",], "age": 30}',
            '{"name": "John", "hobbies": ["reading", "swimming"], "age": 30}',
        ),
        ('{"name": John, "nickname": null}', '{"name": "John", "nickname": null}'),
        ('{"age": 30, "score": 95.5}', '{"age": 30, "score": 95.5}'),
    ],
)
def test_fix_invalid_json_corpus(raw: str, expected: str) -> None:
    fixed = fix_invalid_json(raw)
    assert json.loads(fixed)
    assert fixed == expected


def test_fix_truncated_array_brace() -> None:
    raw = '{"nodes": [{"id": "0", "label": "Person", "properties": {}}], "relationships": [}'
    fixed = fix_invalid_json(raw)
    parsed = json.loads(fixed)
    assert parsed["relationships"] == []
    assert parsed["nodes"][0]["label"] == "Person"


def test_unfixable_missing_value() -> None:
    raw = '{"nodes": [], "relationships": }'
    with pytest.raises(InvalidJSONError):
        fix_invalid_json(raw)


def test_fix_invalid_json_empty() -> None:
    with pytest.raises(InvalidJSONError):
        fix_invalid_json("")


@pytest.mark.parametrize(
    "raw, expected",
    [
        (
            '{"name": "John", "hobbies": {"reading": "yes"',
            '{"name": "John", "hobbies": {"reading": "yes"}}',
        ),
        (
            '{"name": "John", "hobbies": {"reading": "yes"}}}',
            '{"name": "John", "hobbies": {"reading": "yes"}}',
        ),
        (
            '{"name": "John", "hobbies": {"reading": "yes"}, "age": 30}',
            '{"name": "John", "hobbies": {"reading": "yes"}, "age": 30}',
        ),
        (
            '{"person": {"name": "John", "hobbies": {"reading": "yes"}}}',
            '{"person": {"name": "John", "hobbies": {"reading": "yes"}}}',
        ),
        (
            '{"person": {"name": "John", "hobbies": {"reading": "yes"}}',
            '{"person": {"name": "John", "hobbies": {"reading": "yes"}}}',
        ),
        (
            '{"key1": {"key2": {"reading": "yes"}}, "key3": {"age": 30}}}',
            '{"key1": {"key2": {"reading": "yes"}}, "key3": {"age": 30}}',
        ),
        (
            '{"name": "John", "example": "a{b}c", "age": 30}',
            '{"name": "John", "example": "a{b}c", "age": 30}',
        ),
        (
            '{"name": "John", "example": "a{b}c", "hobbies": {"reading": "yes"',
            '{"name": "John", "example": "a{b}c", "hobbies": {"reading": "yes"}}',
        ),
    ],
)
def test_balance_curly_braces(raw: str, expected: str) -> None:
    fixed = balance_curly_braces(raw)
    assert json.loads(fixed)
    assert fixed == expected


def test_fence_stripping() -> None:
    raw = '```json\n{"nodes": [], "relationships": []}\n```'
    assert json.loads(fix_invalid_json(raw)) == {"nodes": [], "relationships": []}
