"""Stage 2 — fixed-size text splitting as a vectorized Spark stage.

Wraps the exact FixedSizeSplitter port
(functions/splitting.py; reference fixed_size_splitter.py:21-149) in
``mapInPandas``: each Arrow batch of documents expands to chunk rows.
The whitespace state machine forces Python here; everything around it
(partitioning, chunk ids, downstream ops) is DataFrame-native.

Scale notes:
* input is repartitioned so one task never holds more than a bounded number
  of documents — and because splitting is per-document, the stage is
  embarrassingly parallel;
* ``chunk_uid = sha1(conv_id ':' chunk_index)`` is deterministic →
  re-running the stage is idempotent (resume requirement), unlike the
  reference's uuid4 chunk ids (types.py:48-65).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from neo4j_graphrag_python_spark.functions.splitting import split_text
from neo4j_graphrag_python_spark.types import SplitterConfig

CHUNKS_FIELDS = (
    "chunk_uid string, conv_id string, chunk_index int, "
    "char_start int, char_end int, text string, boundary_ctx string"
)
# boundary_ctx: the (≤2) document chars immediately before char_start.
# Extraction prepends it so sentence-start-anchored patterns can't produce
# truncated-name false positives at chunk boundaries (see
# transcripts.SENT_PREFIX).  Empty for chunk 0.


def _chunk_uid(conv_id: str, chunk_index: int) -> str:
    import hashlib

    return hashlib.sha1(f"{conv_id}:{chunk_index}".encode("utf-8")).hexdigest()


def _split_stage(
    documents: DataFrame,
    span_fn,
    num_partitions: int | None,
) -> DataFrame:
    """Shared mapInPandas scaffold for splitting stages: ``span_fn(doc)``
    yields ``(chunk_index, char_start, char_end, chunk_text, ctx)`` per
    chunk; everything else (uids, columnar assembly, dtypes, the conv_id
    repartition) is identical across splitters and lives only here."""

    def split_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            uids, convs, idxs, starts, ends, texts, ctxs = (
                [], [], [], [], [], [], [],
            )
            for conv_id, text in zip(pdf["conv_id"], pdf["text"]):
                for i, s, e, chunk, ctx in span_fn(text or ""):
                    uids.append(_chunk_uid(conv_id, i))
                    convs.append(conv_id)
                    idxs.append(i)
                    starts.append(s)
                    ends.append(e)
                    texts.append(chunk)
                    ctxs.append(ctx)
            yield pd.DataFrame(
                {
                    "chunk_uid": pd.Series(uids, dtype="object"),
                    "conv_id": pd.Series(convs, dtype="object"),
                    "chunk_index": pd.Series(idxs, dtype="int32"),
                    "char_start": pd.Series(starts, dtype="int32"),
                    "char_end": pd.Series(ends, dtype="int32"),
                    "text": pd.Series(texts, dtype="object"),
                    "boundary_ctx": pd.Series(ctxs, dtype="object"),
                }
            )

    src = documents.select("conv_id", "text")
    if num_partitions:
        src = src.repartition(num_partitions, "conv_id")
    return src.mapInPandas(split_batches, schema=CHUNKS_FIELDS)


def split_fixed_size(
    documents: DataFrame,
    config: SplitterConfig | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """documents(conv_id, text, ...) → chunks(chunk_uid, conv_id,
    chunk_index, char_start, char_end, text)."""
    config = config or SplitterConfig()
    size, overlap, approximate = (
        config.chunk_size,
        config.chunk_overlap,
        config.approximate,
    )

    def spans(doc: str):
        for i, (s, e, chunk) in enumerate(
            split_text(doc, size, overlap, approximate)
        ):
            yield i, s, e, chunk, doc[max(0, s - 2) : s]

    return _split_stage(documents, spans, num_partitions)


def adapt_text_splitter(splitter):
    """P2 — LangChain / LlamaIndex splitter adapters (reference
    text_splitters/langchain.py:23-62, llamaindex.py:23-64).

    Both reference adapters reduce to the SAME one-method contract:
    ``splitter.split_text(text) -> list[str]`` (their ``run`` wraps each
    returned string in a TextChunk with its enumeration index).  This
    adapter therefore accepts ANY object exposing ``split_text`` — a
    LangChain ``TextSplitter``, a LlamaIndex node-parser, or a plain
    callable — without importing either library (absent here; the duck
    type IS the public contract both define).
    """
    fn = getattr(splitter, "split_text", None)
    if fn is None and callable(splitter):
        fn = splitter
    if fn is None:
        raise TypeError(
            "splitter must expose split_text(text) -> list[str] or be "
            f"callable, got {type(splitter).__name__}"
        )
    return fn


def split_with_adapter(
    documents: DataFrame,
    splitter,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run a third-party text splitter as the splitting stage — the Spark
    stage form of the reference's LangChain/LlamaIndex adapters.

    Output schema matches :func:`split_fixed_size` so the rest of the
    pipeline (extraction, lexical graph, NEXT_CHUNK ordering) is
    splitter-agnostic.  External splitters may normalize text, so char
    offsets are recovered best-effort with a sequential ``str.find`` from
    the previous chunk's start (overlapping splitters re-scan forward);
    a transformed chunk that no longer occurs verbatim gets offset -1 —
    lineage-by-offset is a fixed-size-splitter guarantee, not an adapter
    one (the reference's TextChunk carries no offsets at all).
    ``boundary_ctx`` is emitted only for genuine offsets.

    The splitter object must be picklable (it ships to executors inside
    the Arrow stage closure) — true of LangChain/LlamaIndex splitters.
    """
    split_text_fn = adapt_text_splitter(splitter)

    def spans(doc: str):
        search_from = 0
        last_start = -1
        for i, chunk in enumerate(split_text_fn(doc)):
            s = doc.find(chunk, search_from)
            if s < 0:
                # re-scan from 0 covers a chunk re-starting AT the previous
                # start; a hit strictly before it would be an earlier
                # duplicate occurrence masquerading as a genuine offset —
                # emit the -1 sentinel instead of a regressed offset
                s = doc.find(chunk)
                if 0 <= s < last_start:
                    s = -1
            e = s + len(chunk) if s >= 0 else -1
            yield i, s, e, chunk, (doc[max(0, s - 2) : s] if s > 0 else "")
            if s >= 0:
                search_from = s + 1
                last_start = s

    return _split_stage(documents, spans, num_partitions)
