"""Stage 1 — assemble per-conversation documents from transcript turns.

The reference ingests one document per pipeline run (PdfLoader,
components/pdf_loader.py:53-93).  In the transcripts design, "document" =
one conversation: turns concatenated with ``\\n`` in stable
``(conv_id, turn_idx)`` order, with per-turn char offsets recorded so the
north-rule invariant — *per-turn text equality under stable turn ordering* —
is checkable from chunk lineage alone.

Entirely built-in expressions (groupBy + array_sort + aggregate HOF): one
shuffle on conv_id, no Python, whole-stage codegen applies.  At 10^12-turn
scale this is the canonical "group skewed key" aggregation: AQE handles
reduce-side skew; the downstream splitter re-partitions by chunk_uid so a
monster conversation never pins a single task beyond this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEPARATOR = "\n"


def assemble_documents(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) → documents(conv_id, text,
    n_turns, turn_offsets array<struct<turn_idx,char_start,char_end>>).

    Offsets are exact: turn i occupies [char_start, char_end) of the
    document text, and ``char_end(i) + 1 == char_start(i+1)`` (one-char
    separator).  Null texts are treated as empty strings (the separator
    structure must stay positional for lineage).
    """
    turns = (
        transcripts.select(
            "conv_id",
            F.struct(
                F.col("turn_idx"),
                F.coalesce(F.col("text"), F.lit("")).alias("text"),
            ).alias("turn"),
        )
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_list("turn")).alias("turns"))
    )
    # cumulative char offsets via the aggregate higher-order function —
    # stays inside codegen, no UDF.
    offsets = F.aggregate(
        F.col("turns"),
        F.struct(
            F.lit(0).alias("pos"),
            F.expr(
                "CAST(array() AS array<struct<turn_idx:int,char_start:int,char_end:int>>)"
            ).alias("acc"),
        ),
        lambda acc, t: F.struct(
            (acc["pos"] + F.length(t["text"]) + F.lit(1)).alias("pos"),
            F.concat(
                acc["acc"],
                F.array(
                    F.struct(
                        t["turn_idx"].alias("turn_idx"),
                        acc["pos"].alias("char_start"),
                        (acc["pos"] + F.length(t["text"])).alias("char_end"),
                    )
                ),
            ).alias("acc"),
        ),
        lambda acc: acc["acc"],
    )
    return turns.select(
        "conv_id",
        F.array_join(F.transform("turns", lambda t: t["text"]), SEPARATOR).alias(
            "text"
        ),
        F.size("turns").cast("int").alias("n_turns"),
        offsets.alias("turn_offsets"),
    )


def explode_turn_lineage(documents: DataFrame) -> DataFrame:
    """Reconstruct per-turn texts from document text + offsets.

    Used by tests and the ``kg_turn_lineage`` correctness query: joining
    back to the input transcripts must give byte-identical text per turn.
    """
    return documents.select(
        "conv_id",
        F.explode("turn_offsets").alias("o"),
        F.col("text").alias("doc_text"),
    ).select(
        "conv_id",
        F.col("o.turn_idx").alias("turn_idx"),
        F.expr(
            "substring(doc_text, o.char_start + 1, o.char_end - o.char_start)"
        ).alias("reconstructed_text"),
    )
