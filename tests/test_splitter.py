"""FixedSizeSplitter goldens — ported byte-for-byte from
reference tests/unit/.../test_fixed_size_splitter.py:26-215."""

from __future__ import annotations

import pytest

from neo4j_graphrag_python_spark.functions.splitting import (
    adjust_chunk_end,
    adjust_chunk_start,
    split_text,
)


def texts(spans):
    return [t for _, _, t in spans]


def test_split_text_no_overlap_exact() -> None:
    text = "may thy knife chip and shatter"
    assert texts(split_text(text, 5, 0, approximate=False)) == [
        "may t",
        "hy kn",
        "ife c",
        "hip a",
        "nd sh",
        "atter",
    ]


def test_split_text_with_overlap_exact() -> None:
    text = "may thy knife chip and shatter"
    assert texts(split_text(text, 10, 2, approximate=False)) == [
        "may thy kn",
        "knife chip",
        "ip and sha",
        "hatter",
    ]


def test_split_text_approximate() -> None:
    text = "Hello World, this is a test message."
    assert texts(split_text(text, 10, 2, approximate=True)) == [
        "Hello ",
        "World, ",
        "this is a ",
        "a test ",
        "message.",
    ]


def test_split_text_exact_same_input() -> None:
    text = "Hello World, this is a test message."
    assert texts(split_text(text, 10, 2, approximate=False)) == [
        "Hello Worl",
        "rld, this ",
        "s is a tes",
        "est messag",
        "age.",
    ]


def test_split_short_text_single_chunk() -> None:
    assert texts(split_text("Short text", 20, 5)) == ["Short text"]


def test_split_no_whitespace() -> None:
    assert texts(split_text("1234567890", 5, 1, approximate=True)) == [
        "12345",
        "56789",
        "90",
    ]


def test_split_empty_text() -> None:
    assert split_text("", 10, 2) == []


def test_invalid_chunk_size() -> None:
    with pytest.raises(ValueError):
        split_text("x", 0, 0)


def test_invalid_overlap() -> None:
    with pytest.raises(ValueError):
        split_text("x", 5, 5)


@pytest.mark.parametrize(
    "text, approximate_start, expected",
    [
        ("Hello World", 0, 0),
        ("Hello World", 6, 6),  # at word start already
        ("Hello World", 8, 6),  # mid-word → back to word start
        ("HelloWorld", 5, 5),  # no whitespace → fallback to proposed
    ],
)
def test_adjust_chunk_start(text: str, approximate_start: int, expected: int) -> None:
    assert adjust_chunk_start(text, approximate_start) == expected


@pytest.mark.parametrize(
    "text, start, approximate_end, expected",
    [
        ("Hello World", 0, 5, 5),  # boundary at whitespace
        ("Hello World", 0, 8, 6),  # mid-word → back
        ("HelloWorld", 0, 5, 5),  # no whitespace → fallback
        ("Hello World", 0, 11, 11),  # end of text
    ],
)
def test_adjust_chunk_end(text: str, start: int, approximate_end: int, expected: int) -> None:
    assert adjust_chunk_end(text, start, approximate_end) == expected


def test_spans_reconstruct_text() -> None:
    text = "The quick brown fox jumps over the lazy dog. " * 20
    for approximate in (True, False):
        spans = split_text(text, 50, 10, approximate=approximate)
        for s, e, chunk in spans:
            assert text[s:e] == chunk
        # full coverage: every char inside some span
        covered = set()
        for s, e, _ in spans:
            covered.update(range(s, e))
        assert covered == set(range(len(text)))
