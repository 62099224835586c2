"""Custom stateful streaming operator: incremental conversation tracking.

``applyInPandasWithState`` over the transcripts stream keyed by conv_id:
per conversation the state carries (n_turns, max_turn_idx, n_chars) and
each micro-batch emits the updated aggregate — the building block for
"conversation complete" detection (downstream triggers extraction when a
conversation stops growing) and for feed-health dashboards.

State survives restarts through the stream checkpoint: a second
``availableNow`` run over new files continues from the persisted counts —
asserted in tests/test_stateful_stream.py.

This is the Structured-Streaming-native alternative to the
foreachBatch pipeline in streaming/stream.py; the reference has no
streaming at all (SURVEY.md §2.10), this covers the
``applyInPandasWithState`` slot the target brief names explicitly.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn_idx int, n_chars long, batch_updates int"
)
STATE_SCHEMA = "n_turns long, max_turn_idx int, n_chars long, batch_updates int"


def _update_conversation(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    n_turns, max_turn, n_chars, updates = (
        state.get if state.exists else (0, -1, 0, 0)
    )
    for pdf in pdfs:
        n_turns += len(pdf)
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            n_chars += int(pdf["text"].fillna("").str.len().sum())
    updates += 1
    state.update((n_turns, max_turn, n_chars, updates))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "max_turn_idx": [max_turn],
            "n_chars": [n_chars],
            "batch_updates": [updates],
        }
    )


def conversation_progress(stream: DataFrame) -> DataFrame:
    """transcripts stream → per-conversation running aggregates."""
    return (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conversation,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            # "append" here refers to the operator contract (each
            # emitted row is final for this trigger); the running
            # aggregate lives in the state, so the parquet sink can
            # append versioned rows (latest batch_updates wins)
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_progress_stream(
    stream: DataFrame, output_path: str, checkpoint_dir: str
):
    """Materialize the running aggregates to parquet (update semantics via
    append of versioned rows; latest row per conv_id = current state)."""
    return (
        conversation_progress(stream)
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
