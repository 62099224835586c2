"""applyInPandasWithState: state persists across stream restarts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from neo4j_graphrag_python_spark.streaming.stateful import run_progress_stream
from neo4j_graphrag_python_spark.streaming.stream import read_transcript_stream
from neo4j_graphrag_python_spark.types import TRANSCRIPTS_SCHEMA


def write_batch(spark, path, rows):
    spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_state_accumulates_across_restarts(spark, tmp_path) -> None:
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ts = dt.datetime(2025, 1, 1)

    write_batch(
        spark,
        src,
        [
            ("c1", 0, "user", "hello", None, ts),
            ("c1", 1, "assistant", "hi there", None, ts),
            ("c2", 0, "user", "x", None, ts),
        ],
    )
    q = run_progress_stream(read_transcript_stream(spark, src), out, ckpt)
    q.awaitTermination(180)

    first = {
        r["conv_id"]: r
        for r in spark.read.parquet(out).collect()
    }
    assert first["c1"]["n_turns"] == 2 and first["c1"]["max_turn_idx"] == 1
    assert first["c1"]["n_chars"] == len("hello") + len("hi there")
    assert first["c2"]["n_turns"] == 1

    # second batch of files + a fresh availableNow run: state must resume
    # from the checkpoint, not restart from zero
    write_batch(spark, src, [("c1", 2, "tool", "abc", "search", ts)])
    q2 = run_progress_stream(read_transcript_stream(spark, src), out, ckpt)
    q2.awaitTermination(180)

    latest = (
        spark.read.parquet(out)
        .orderBy(F.desc("batch_updates"))
        .where(F.col("conv_id") == "c1")
        .collect()[0]
    )
    assert latest["n_turns"] == 3
    assert latest["max_turn_idx"] == 2
    assert latest["n_chars"] == len("hello") + len("hi there") + len("abc")
    assert latest["batch_updates"] == 2
