"""GraphRAG read path — retrieve → context → prompt → answer.

Reference: generation/graphrag.py:85-196 (``GraphRAG.search``): run the
retriever, join retrieved items with newlines into a context block,
format the RAG prompt, call the LLM; ``response_fallback`` when the
context is empty (:141-142); optional message-history summarization
(:161-187) becomes a window over the transcripts table (W4).

The LLM slot is a plain ``Callable[[str], str]`` — tests use a
deterministic echo model.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Window, functions as F

from neo4j_graphrag_python_spark.functions.prompts import RagTemplate
from neo4j_graphrag_python_spark.retrievers import vector_search

LlmFn = Callable[[str], str]


@dataclass
class RagResult:
    answer: str
    context: str
    retrieved_ids: list[str]


def last_messages(
    transcripts: DataFrame, conv_id: str, n: int = 4
) -> list[str]:
    """Message-history window (reference message_history.py:151-196):
    last n turns of a conversation in order."""
    w = Window.partitionBy("conv_id").orderBy(F.desc("turn_idx"))
    rows = (
        transcripts.where(F.col("conv_id") == conv_id)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .orderBy("turn_idx")
        .select("role", "text")
        .collect()
    )
    return [f"{r['role']}: {r['text']}" for r in rows]


SUMMARY_SYSTEM_MESSAGE = (
    "You are a summarization assistant. Summarize the given text in no "
    "more than 300 words."
)


def chat_summary_prompt(message_history: list) -> str:
    """Reference GraphRAG._chat_summary_prompt (graphrag.py:179-187).

    Accepts the reference's {'role','content'} dicts AND the plain
    'role: text' strings produced by this module's own
    :func:`last_messages` — the natural wiring must not crash."""
    history = "\n".join(
        m if isinstance(m, str) else f"{m['role']}: {m['content']}"
        for m in message_history
    )
    return f"""
Summarize the message history:

{history}
"""


def conversation_prompt(summary: str, current_query: str) -> str:
    """Reference GraphRAG.conversation_prompt (graphrag.py:189-196)."""
    return f"""
Message Summary:
{summary}

Current Query:
{current_query}
"""


def build_query(
    query_text: str,
    llm_fn: LlmFn,
    message_history: list | None = None,
) -> str:
    """Reference GraphRAG._build_query (graphrag.py:161-177): with history,
    summarize it through the LLM (same system message) and wrap the query;
    without, pass the query through unchanged."""
    if message_history:
        summary = llm_fn(
            SUMMARY_SYSTEM_MESSAGE + "\n" + chat_summary_prompt(message_history)
        )
        return conversation_prompt(summary=summary, current_query=query_text)
    return query_text


def graphrag_search(
    nodes: DataFrame,
    query_text: str,
    llm_fn: LlmFn,
    top_k: int = 5,
    response_fallback: str | None = None,
    examples: str = "",
    context_property: str = "name",
    message_history: list | None = None,
) -> RagResult:
    """GraphRAG.search semantics over the materialized graph."""
    query_text = build_query(query_text, llm_fn, message_history)
    hits = vector_search(nodes, query_text=query_text, top_k=top_k)
    enriched = hits.join(
        nodes.select(
            F.col("id"),
            F.col("properties").getItem(context_property).alias("_ctx"),
        ),
        "id",
    ).orderBy(F.desc("score"), "id")
    rows = enriched.collect()
    items = [r["_ctx"] for r in rows if r["_ctx"] is not None]
    context = "\n".join(items)
    if not context and response_fallback is not None:
        return RagResult(answer=response_fallback, context="", retrieved_ids=[])
    prompt = RagTemplate().format(
        context=context, query_text=query_text, examples=examples
    )
    return RagResult(
        answer=llm_fn(prompt),
        context=context,
        retrieved_ids=[r["id"] for r in rows],
    )
