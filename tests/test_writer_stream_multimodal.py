"""Resumable writes, streaming pipeline, multimodal plumbing."""

from __future__ import annotations

import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from neo4j_graphrag_python_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    real_decoder_stub,
)
from neo4j_graphrag_python_spark.operators.writer import (
    completed_buckets,
    dedupe_edges,
    read_resumable,
    write_resumable,
)
from neo4j_graphrag_python_spark.types import EDGES_SCHEMA


def test_write_resumable_skips_completed(spark, tmp_path) -> None:
    df = spark.range(1000).select(
        F.col("id"), F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    path = str(tmp_path / "out")
    r1 = write_resumable(df, path, key_col="key", num_buckets=8)
    assert sorted(r1["written"]) == list(range(8)) and r1["skipped"] == []
    assert read_resumable(spark, path).count() == 1000

    # simulate a crash that lost two bucket manifests → only those rerun
    for b in (2, 5):
        (Path(path) / "_manifest" / f"{b}.json").unlink()
    assert completed_buckets(path) == {0, 1, 3, 4, 6, 7}
    r2 = write_resumable(df, path, key_col="key", num_buckets=8)
    assert sorted(r2["written"]) == [2, 5]
    assert sorted(r2["skipped"]) == [0, 1, 3, 4, 6, 7]
    assert read_resumable(spark, path).count() == 1000

    # fully complete → everything skipped, data intact
    r3 = write_resumable(df, path, key_col="key", num_buckets=8)
    assert r3["written"] == [] and len(r3["skipped"]) == 8
    assert read_resumable(spark, path).count() == 1000


def test_dedupe_edges_first_wins(spark) -> None:
    rows = [
        ("a", "b", "REL", {"w": "2"}, "c1", "u2"),
        ("a", "b", "REL", {"w": "1"}, "c1", "u1"),  # earlier chunk wins
        ("a", "c", "REL", {}, "c1", "u1"),
    ]
    edges = spark.createDataFrame(rows, EDGES_SCHEMA)
    out = {(r["start_node_id"], r["end_node_id"]): r for r in dedupe_edges(edges).collect()}
    assert len(out) == 2
    assert out[("a", "b")]["properties"] == {"w": "1"}


def test_streaming_pipeline(spark, tmp_path) -> None:
    from neo4j_graphrag_python_spark import transcripts as tr
    from neo4j_graphrag_python_spark.operators.extractor import (
        demo_rules,
        regex_extractor,
    )
    from neo4j_graphrag_python_spark.schema import demo_schema
    from neo4j_graphrag_python_spark.streaming.stream import (
        read_transcript_stream,
        stream_kg_pipeline,
    )
    from neo4j_graphrag_python_spark.types import PipelineConfig, SplitterConfig

    src = tmp_path / "stream_src"
    src.mkdir()
    tr.write_transcripts(src / "batch1.parquet", 0.0001)

    stream = read_transcript_stream(spark, str(src))
    assert stream.isStreaming
    q = stream_kg_pipeline(
        stream,
        regex_extractor(demo_rules()),
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=demo_schema(),
        config=PipelineConfig(splitter=SplitterConfig(600, 200)),
        trigger_once=True,
    )
    q.awaitTermination(180)
    nodes = spark.read.parquet(str(tmp_path / "out" / "nodes"))
    assert nodes.count() > 0
    assert nodes.where(F.col("label") == "Person").count() > 0


def test_multimodal_features_deterministic(spark) -> None:
    media = spark.createDataFrame(
        [
            ("m1", "image", bytearray(b"payload-1"), {"w": "64"}),
            ("m2", "image", bytearray(b"payload-1"), {"w": "64"}),
            ("m3", "audio", bytearray(b"other"), {}),
        ],
        "media_id string, kind string, payload binary, meta map<string,string>",
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows["m1"]["status"] == "ok"
    assert rows["m1"]["feature"] == rows["m2"]["feature"]  # deterministic
    assert rows["m1"]["feature"] != rows["m3"]["feature"]
    assert rows["m1"]["n_bytes"] == 9


def test_multimodal_decoder_stub_surfaces_status(spark) -> None:
    media = spark.createDataFrame(
        [("m1", "video", bytearray(b"x"), {})],
        "media_id string, kind string, payload binary, meta map<string,string>",
    )
    rows = extract_features(media, decode_fn=real_decoder_stub).collect()
    assert rows[0]["status"] == "error:decoder-not-available"
    assert rows[0]["feature"] is None


def test_frame_sample_plan(spark) -> None:
    media = spark.createDataFrame(
        [("v1", "video", bytearray(b"x"), {"duration_s": "3.5"})],
        "media_id string, kind string, payload binary, meta map<string,string>",
    )
    frames = frame_sample_plan(media, every_n_seconds=1.0).collect()
    assert [r["frame_ts"] for r in frames] == [0.0, 1.0, 2.0]


def test_pdf_text_extraction_with_fake_codec(spark) -> None:
    """S1 plumbing: payload → page texts → splitter-ready documents.
    The pypdf slot is faked (not installed here); reference semantics =
    pages joined with newline (pdf_loader.py:66-68)."""
    from neo4j_graphrag_python_spark.operators.multimodal import (
        PdfLoaderError,
        extract_pdf_text,
    )
    from neo4j_graphrag_python_spark.operators.splitter import split_fixed_size
    from neo4j_graphrag_python_spark.types import SplitterConfig

    def fake_pdf(payload: bytes) -> str:
        if not payload.startswith(b"%PDF"):
            raise PdfLoaderError("not a pdf")
        return "\n".join(payload[5:].decode("utf-8").split("\x0c"))

    media = spark.createDataFrame(
        [
            ("doc1.pdf", "pdf", b"%PDF-page one text\x0cpage two text", {}),
            ("bad.pdf", "pdf", b"GARBAGE", {}),
        ],
        "media_id string, kind string, payload binary, meta map<string,string>",
    )
    docs = extract_pdf_text(media, text_fn=fake_pdf)
    rows = {r["conv_id"]: r for r in docs.collect()}
    assert rows["doc1.pdf"]["text"] == "page one text\npage two text"
    assert rows["doc1.pdf"]["status"] == "ok"
    assert rows["bad.pdf"]["text"] is None
    assert rows["bad.pdf"]["status"] == "error:PdfLoaderError"
    # splitter consumes the extracted documents unchanged
    ok = docs.where(docs.status == "ok").select("conv_id", "text", "n_turns")
    chunks = split_fixed_size(ok, SplitterConfig(10, 2, approximate=False))
    assert chunks.count() > 1


def test_pdf_text_extraction_raise_mode(spark) -> None:
    from py4j.protocol import Py4JJavaError
    from neo4j_graphrag_python_spark.operators.multimodal import extract_pdf_text

    media = spark.createDataFrame(
        [("bad.pdf", "pdf", b"GARBAGE", {})],
        "media_id string, kind string, payload binary, meta map<string,string>",
    )

    def always_fail(payload: bytes) -> str:
        raise ValueError("boom")

    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        extract_pdf_text(media, text_fn=always_fail, on_error="RAISE").collect()
    assert "PdfLoaderError" in str(exc.value) or "boom" in str(exc.value)


def test_default_pdf_slot_requires_pypdf() -> None:
    import importlib.util

    from neo4j_graphrag_python_spark.operators.multimodal import (
        PdfLoaderError,
        default_pdf_text_fn,
    )

    if importlib.util.find_spec("pypdf") is None:
        import pytest as _pytest

        with _pytest.raises(PdfLoaderError, match="pypdf"):
            default_pdf_text_fn(b"%PDF-1.4")


def test_streaming_dedup_exact(spark, tmp_path) -> None:
    """Duplicate texts within the watermark horizon are dropped; state is
    keyed by content hash and bounded by the horizon."""
    import datetime as dt

    from neo4j_graphrag_python_spark.streaming.stream import (
        read_transcript_stream,
        streaming_dedup_exact,
    )

    src = tmp_path / "dd_src"
    src.mkdir()
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "hello world", None, t0),
        ("c1", 1, "user", "hello world", None, t0 + dt.timedelta(seconds=30)),
        ("c2", 0, "user", "different text", None, t0 + dt.timedelta(seconds=40)),
        ("c2", 1, "user", "hello world", None, t0 + dt.timedelta(seconds=50)),
    ]
    from neo4j_graphrag_python_spark.types import TRANSCRIPTS_SCHEMA

    spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )
    stream = read_transcript_stream(spark, str(src / "b1.parquet"))
    dedup = streaming_dedup_exact(stream, watermark="10 minutes")
    q = (
        dedup.writeStream.format("parquet")
        .option("path", str(tmp_path / "dd_out"))
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "dd_out"))
    texts = [r["text"] for r in out.collect()]
    assert sorted(texts) == ["different text", "hello world"]
    assert "_text_hash" not in out.columns
