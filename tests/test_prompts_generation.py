"""Prompt templates, LLM-extractor adapter, GraphRAG read path."""

from __future__ import annotations

import json

import pytest

from neo4j_graphrag_python_spark.functions.embedding import embed_text
from neo4j_graphrag_python_spark.functions.prompts import (
    ERExtractionTemplate,
    PromptMissingInputError,
    PromptTemplate,
    RagTemplate,
)
from neo4j_graphrag_python_spark.functions.text import (
    clean_string_values,
    value_sanitize,
)
from neo4j_graphrag_python_spark.generation import graphrag_search, last_messages
from neo4j_graphrag_python_spark.operators.extractor import llm_extractor
from neo4j_graphrag_python_spark.schema import demo_schema
from neo4j_graphrag_python_spark.types import NODES_SCHEMA, TRANSCRIPTS_SCHEMA


def test_prompt_template_required_inputs() -> None:
    t = PromptTemplate("Hello {name}, you are {age}", expected_inputs=["name"])
    assert t.format(name="Bob") == "Hello Bob, you are "
    with pytest.raises(PromptMissingInputError):
        t.format(age=3)


def test_er_template_contract() -> None:
    p = ERExtractionTemplate().format(
        text="Alice works for Acme.", schema=demo_schema().to_dict()
    )
    assert '"nodes":' in p and '"relationships":' in p
    assert "Alice works for Acme." in p
    assert "WORKS_FOR" in p  # schema serialized into prompt


def test_rag_template() -> None:
    p = RagTemplate().format(context="ctx", query_text="q")
    assert "ctx" in p and "Question:\nq" in p
    with pytest.raises(PromptMissingInputError):
        RagTemplate().format(query_text="q", context=None)


def test_llm_extractor_adapter() -> None:
    captured = []

    def fake_llm(prompts):
        captured.extend(prompts)
        return ['{"nodes": [], "relationships": []}'] * len(prompts)

    fn = llm_extractor(fake_llm, schema=demo_schema(), examples="EX1")
    out = fn(["chunk one", "chunk two"])
    assert len(out) == 2 and json.loads(out[0]) == {"nodes": [], "relationships": []}
    assert "chunk one" in captured[0] and "EX1" in captured[0]
    assert "WORKS_FOR" in captured[0]


def test_text_sanitizers() -> None:
    assert clean_string_values("a\nb\rc") == "a b c"
    assert value_sanitize({"ok": [1, 2], "big": list(range(200)), "d": {"x": 1}}) == {
        "ok": [1, 2],
        "d": {"x": 1},
    }


def test_last_messages(spark) -> None:
    import datetime as dt

    rows = [
        ("c1", i, ["user", "assistant", "tool"][i % 3], f"turn {i}", None,
         dt.datetime(2025, 1, 1, 0, i))
        for i in range(6)
    ]
    t = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    msgs = last_messages(t, "c1", n=3)
    assert msgs == ["user: turn 3", "assistant: turn 4", "tool: turn 5"]


def test_graphrag_search(spark) -> None:
    names = ["Alice", "Bob"]
    nodes = spark.createDataFrame(
        [
            (f"n{i}", "Person", True, {"name": n},
             [float(x) for x in embed_text(n)], "c1", "u1")
            for i, n in enumerate(names)
        ],
        NODES_SCHEMA,
    )
    result = graphrag_search(nodes, "Alice", llm_fn=lambda p: f"ANSWER[{len(p)}]")
    assert result.context.splitlines()[0] == "Alice"
    assert result.retrieved_ids[0] == "n0"
    assert result.answer.startswith("ANSWER[")

    empty = nodes.where("id = 'none'")
    fb = graphrag_search(
        empty, "Alice", llm_fn=lambda p: "x", response_fallback="no context"
    )
    assert fb.answer == "no context" and fb.retrieved_ids == []


def test_build_query_with_message_history() -> None:
    """Reference _build_query semantics (graphrag.py:161-187): history is
    summarized through the LLM and wrapped with the current query."""
    from neo4j_graphrag_python_spark.generation import build_query

    calls = []

    def llm(prompt: str) -> str:
        calls.append(prompt)
        return "SUMMARY_TEXT"

    out = build_query(
        "what now?",
        llm,
        message_history=[
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
        ],
    )
    assert "Message Summary:\nSUMMARY_TEXT" in out
    assert "Current Query:\nwhat now?" in out
    assert "user: hi" in calls[0] and "assistant: hello" in calls[0]
    assert "summarization assistant" in calls[0]
    # no history → identity
    assert build_query("plain", llm) == "plain"


def test_build_query_accepts_last_messages_strings() -> None:
    """The module's own last_messages output ('role: text' strings) must
    be accepted by the summarization path (review finding)."""
    from neo4j_graphrag_python_spark.generation import build_query

    out = build_query(
        "next?", lambda p: "S", message_history=["user: a", "assistant: b"]
    )
    assert "Message Summary:\nS" in out
