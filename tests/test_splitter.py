"""FixedSizeSplitter goldens — ported byte-for-byte from
reference tests/unit/.../test_fixed_size_splitter.py:26-215."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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
    "text, size, overlap",
    [
        # a word longer than step pulls the adjusted start back to the
        # same boundary every iteration — the reference's own run loop
        # (fixed_size_splitter.py:124-149) hangs on these; the port must
        # terminate with full coverage instead (splitting.py divergence
        # guard).  Period-1 fixed point:
        (" bbbbbb dddddddddddd", 10, 5),
        # chunk_size > 2*step: the cycle re-forms around a one-shot
        # mid-word fallback (period-4 shape) — only whole-state
        # detection breaks it
        (" " + "b" * 9 + " cc " + "d" * 30, 12, 9),
        # long unbroken token mid-corpus at a production-like ratio
        ("lead " + "w" * 900 + " tail " + "v" * 900 + " end", 600, 400),
    ],
)
def test_split_terminates_where_reference_diverges(
    text: str, size: int, overlap: int
) -> None:
    spans = split_text(text, size, overlap, approximate=True)
    covered: set[int] = set()
    for s, e, chunk in spans:
        assert text[s:e] == chunk
        assert e > s
        covered.update(range(s, e))
    assert covered == set(range(len(text)))
    # bounded output: far below the runaway regime
    assert len(spans) <= 4 * (len(text) // max(1, size - overlap) + 2)


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


class FakeLangChainSplitter:
    """Duck-typed stand-in for langchain_text_splitters.TextSplitter /
    llama_index node parsers: the whole adapter contract is
    split_text(str) -> list[str] (reference langchain.py:44-62,
    llamaindex.py:46-64; libs absent in this environment)."""

    def __init__(self, sep: str = ". ") -> None:
        self.sep = sep

    def split_text(self, text: str) -> list[str]:
        return [p for p in text.split(self.sep) if p]


def test_adapt_text_splitter_contract() -> None:
    from neo4j_graphrag_python_spark.operators.splitter import (
        adapt_text_splitter,
    )

    fn = adapt_text_splitter(FakeLangChainSplitter())
    assert fn("a. b. c") == ["a", "b", "c"]
    assert adapt_text_splitter(lambda t: [t])("x") == ["x"]
    with pytest.raises(TypeError):
        adapt_text_splitter(42)


def test_split_with_adapter_stage(spark) -> None:
    """P2 adapters as a Spark stage: third-party splitter output flows
    through the same chunks schema, with best-effort offsets, and feeds
    extraction unchanged."""
    from neo4j_graphrag_python_spark.operators.extractor import (
        demo_rules,
        extract_graph_rows,
        regex_extractor,
    )
    from neo4j_graphrag_python_spark.operators.splitter import (
        split_fixed_size,
        split_with_adapter,
    )

    from types import SimpleNamespace

    docs = spark.createDataFrame(
        [("c1", "Alice works for Acme Corp.\nBob works for Globex.\nok")],
        ["conv_id", "text"],
    )
    # SimpleNamespace + lambda pickle BY VALUE (a module-level test class
    # would pickle by reference and fail to import on executors)
    fake = SimpleNamespace(
        split_text=lambda t: [p for p in t.split("\n") if p]
    )
    chunks = split_with_adapter(docs, fake).orderBy("chunk_index")
    rows = chunks.collect()
    assert [r["text"] for r in rows] == [
        "Alice works for Acme Corp.",
        "Bob works for Globex.",
        "ok",
    ]
    # schema identical to the fixed-size stage → pipeline-compatible
    assert chunks.columns == split_fixed_size(docs).columns
    # best-effort offsets: these chunks occur verbatim, so they are real
    doc = docs.collect()[0]["text"]
    for r in rows:
        assert doc[r["char_start"] : r["char_end"]] == r["text"]
    # and extraction consumes the adapter's chunks unchanged
    g = extract_graph_rows(chunks, regex_extractor(demo_rules()))
    names = {
        r["properties"]["name"]
        for r in g.where(F.col("kind") == "node").collect()
    }
    assert {"Alice", "Acme Corp", "Bob", "Globex"} <= names


def test_split_with_adapter_transformed_chunks_get_sentinel(spark) -> None:
    """A splitter that rewrites text (not a substring) yields offset -1 —
    lineage-by-offset is only promised by the fixed-size splitter."""
    from neo4j_graphrag_python_spark.operators.splitter import (
        split_with_adapter,
    )

    docs = spark.createDataFrame([("c1", "hello world")], ["conv_id", "text"])
    out = split_with_adapter(docs, lambda t: [t.upper()]).collect()
    assert out[0]["char_start"] == -1 and out[0]["char_end"] == -1


def test_split_with_adapter_duplicate_chunk_never_regresses(spark) -> None:
    """A repeated chunk emitted later must not be assigned an EARLIER
    occurrence's offset (ADVICE r3): the re-scan-from-0 fallback emits
    the -1 sentinel when its hit lies strictly before the previous
    chunk's start, so offsets either advance or are honestly unknown."""
    from neo4j_graphrag_python_spark.operators.splitter import (
        split_with_adapter,
    )

    # "ab" occurs at 0 and 6; the splitter walks forward then re-emits
    # "ab" after the cursor has passed the last occurrence
    docs = spark.createDataFrame([("c1", "ab cd ab ef")], ["conv_id", "text"])
    chunks = ["ab", "cd", "ab", "ef", "ab"]
    out = {
        r["chunk_index"]: r["char_start"]
        for r in split_with_adapter(docs, lambda t: list(chunks)).collect()
    }
    assert out[0] == 0 and out[1] == 3 and out[2] == 6 and out[3] == 9
    # 5th chunk: no occurrence at/after 9 except... none — fallback finds
    # 0 < last_start=9 → sentinel, not a regressed "0"
    assert out[4] == -1
