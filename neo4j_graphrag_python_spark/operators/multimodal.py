"""Multimodal column plumbing: image/audio/video as opaque binary columns.

A 100 TB training-data pipeline carries media as ``binary`` payloads with
typed metadata.  The Spark-side mechanics here are real and tested —
schema, batch shape, partition sizing, UDF signatures — while the actual
codec work is stubbed (decode libraries are not available in this
container): ``decode_fn=None`` uses a deterministic fake so the pipeline
is runnable end-to-end; pass a real decoder (PIL/ffmpeg/...) in
production, the plumbing is unchanged.

Schema convention:

    media: (media_id string, kind string ∈ {image,audio,video},
            payload binary, meta map<string,string>)
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURES_SCHEMA = (
    "media_id string, kind string, n_bytes long, feature array<float>, "
    "status string"
)


def read_binary_dir(spark, path: str, glob: str = "*") -> DataFrame:
    """Directory of media files → media frame via the binaryFile source
    (streams content; partition sizing via maxPartitionBytes applies)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path").alias("media_id"),
        F.element_at(F.split(F.col("path"), r"\."), -1).alias("kind"),
        F.col("content").alias("payload"),
        F.create_map(
            F.lit("length"), F.col("length").cast("string"),
            F.lit("modificationTime"), F.col("modificationTime").cast("string"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a codec+feature-extractor: hash-derived
    unit vector.  Replace with a real decoder in production."""
    import hashlib

    import numpy as np

    if payload is None:
        raise ValueError("empty payload")
    d = hashlib.sha256(bytes(payload)).digest()
    v = np.frombuffer((d * ((dim * 4) // len(d) + 1))[: dim * 4], dtype=np.uint32)
    v = (v.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    n = float(np.linalg.norm(v))
    return (v / n).astype(np.float32).tolist() if n else [0.0] * dim


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_target_bytes: int | None = None,
) -> DataFrame:
    """media → per-item feature vectors via mapInPandas.

    ``decode_fn`` runs per item inside an Arrow batch; failures are
    captured per-row in ``status`` (never fail the task for one corrupt
    file — at 10^9 files some always are).

    Partition sizing: frames from :func:`read_binary_dir` are already
    size-bounded by the binaryFile source (maxPartitionBytes), so the
    DEFAULT is to keep the incoming partitioning — no extra pass over the
    payload column.  For media from other sources, pass
    ``batch_target_bytes`` to resize from the ``meta['length']`` metadata
    when present (no payload scan), falling back to one octet_length
    aggregate otherwise (batch DataFrames only)."""
    fn = decode_fn or _fake_decode

    if batch_target_bytes and not media.isStreaming:
        size_col = (
            F.coalesce(
                F.col("meta").getItem("length").cast("long"),
                F.octet_length(F.col("payload")).cast("long"),
            )
            if "meta" in media.columns
            else F.octet_length(F.col("payload")).cast("long")
        )
        total = media.agg(F.sum(size_col).alias("b")).first()["b"]
        if total:
            media = media.repartition(max(1, int(total // batch_target_bytes) + 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "kind": [],
                "n_bytes": [],
                "feature": [],
                "status": [],
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload) if payload is not None else 0)
                try:
                    out["feature"].append(fn(payload))
                    out["status"].append("ok")
                except NotImplementedError:
                    out["feature"].append(None)
                    out["status"].append("error:decoder-not-available")
                except Exception as e:  # corrupt payloads stay rows
                    out["feature"].append(None)
                    out["status"].append(f"error:{type(e).__name__}")
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def real_decoder_stub(payload: bytes) -> list[float]:
    """The production slot: decode image/audio/video and extract features.

    Raises NotImplementedError here — PIL/torchvision/ffmpeg are not in
    this container.  extract_features() surfaces that per-row as
    ``status='error:decoder-not-available'`` without failing the job.
    """
    raise NotImplementedError("media codecs not available in this environment")


# ---------------------------------------------------------------------------
# PDF text extraction (S1 — reference pdf_loader.py:53-93)
# ---------------------------------------------------------------------------


class PdfLoaderError(RuntimeError):
    """Reference PdfLoaderError analog (exceptions surfaced per row or,
    with on_error='RAISE', failing the job)."""


def default_pdf_text_fn(payload: bytes) -> str:
    """Reference PdfLoader.load_file semantics (pdf_loader.py:55-72):
    pypdf page loop, pages joined with '\\n'.  pypdf is gated behind an
    import-try — this container does not ship it, so tests exercise the
    plumbing with a fake extractor and this slot raises PdfLoaderError
    exactly like the reference wraps any parse failure."""
    try:
        import io

        import pypdf
    except ImportError as e:  # pragma: no cover - pypdf absent here
        raise PdfLoaderError("pypdf is not installed") from e
    try:
        pdf = pypdf.PdfReader(io.BytesIO(payload))
        return "\n".join(page.extract_text() for page in pdf.pages)
    except Exception as e:  # pragma: no cover
        raise PdfLoaderError(e) from e


def extract_pdf_text(
    media: DataFrame,
    text_fn: Callable[[bytes], str] | None = None,
    on_error: str = "IGNORE",
) -> DataFrame:
    """Binary PDF payloads → (conv_id, text, n_turns=1, status) documents,
    ready for split_fixed_size (the reference feeds PdfLoader output into
    the splitter the same way).

    Arrow-batched mapInPandas; per-row failure capture mirrors
    extract_features — at 10^9 documents some PDFs are always corrupt, and
    one bad file must not kill the stage unless on_error='RAISE'
    (reference raises PdfLoaderError unconditionally; IGNORE is the
    distributed default for the same reason OnError exists on the
    extractor)."""
    fn = text_fn or default_pdf_text_fn

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"conv_id": [], "text": [], "n_turns": [], "status": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["conv_id"].append(mid)
                out["n_turns"].append(1)
                try:
                    out["text"].append(fn(bytes(payload)))
                    out["status"].append("ok")
                except Exception as e:  # noqa: BLE001
                    if on_error == "RAISE":
                        raise PdfLoaderError(str(e)) from e
                    out["text"].append(None)
                    out["status"].append(f"error:{type(e).__name__}")
            yield pd.DataFrame(
                {c: pd.Series(v, dtype="object") for c, v in out.items()},
                columns=["conv_id", "text", "n_turns", "status"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema="conv_id string, text string, n_turns int, status string"
    )


def frame_sample_plan(
    media: DataFrame, every_n_seconds: float = 1.0
) -> DataFrame:
    """Video frame-sampling *plan*: one row per desired frame timestamp
    (duration from metadata), ready to join with a decode stage.  The
    expansion is built-in (sequence/explode) — only decoding is stubbed."""
    dur = F.coalesce(F.col("meta").getItem("duration_s").cast("double"), F.lit(0.0))
    n_frames = F.greatest((dur / every_n_seconds).cast("int"), F.lit(1))
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.round(i * every_n_seconds, 3),
            )
        ).alias("frame_ts"),
    )
