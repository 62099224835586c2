"""Training-sequence packing over a document corpus.

Two standard packing disciplines from LLM pretraining / fine-tuning
pipelines, both expressed so the heavy work is distributed and the
output is exactly reproducible (both ship driver queries with exact
value oracles):

  * ``pack_sequence_coords`` — concat-and-chunk (GPT/T5-style
    pretraining): the corpus token stream is conceptually concatenated
    in a deterministic document order and cut into fixed ``seq_len``
    sequences; each document's packing coordinates (global start
    offset, first/last sequence index, offset within the first
    sequence) are pure functions of an ordered prefix sum of token
    counts.  The prefix sum is computed with a TWO-PHASE plan — the
    scale-critical part, see the function docstring — never a global
    single-reducer window.
  * ``pack_bins_greedy`` — whole-document greedy bin packing (SFT
    style: no document straddles a sequence): within each stratum
    (source), documents are taken in order and appended to the current
    bin unless they would overflow ``seq_len``, which starts a new
    bin.  The recurrence is inherently sequential PER STRATUM but
    embarrassingly parallel ACROSS strata — one ``applyInPandas``
    group per source, state never leaves the executor.

No counterpart in the reference repo (these are corpus-curation
operators beyond its KG scope); the discipline definitions are the
public ones (Raffel et al. 2020 §3.1.2 concat-and-chunk; greedy
first-fit packing as in t5x/seqio packing docs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _token_count_col(text_col: str) -> Column:
    """Whitespace token count, identical to token_stats / the DuckDB
    oracle expression (trim → split on \\s+; empty/blank text → 0)."""
    trimmed = F.trim(F.col(text_col))
    return (
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("long")
    )


def pack_sequence_coords(
    docs: DataFrame,
    seq_len: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing coordinates for every document.

    Documents are ordered by ``id_col`` (must be numeric — the corpus
    order key), their token streams conceptually concatenated and cut
    into ``seq_len``-token training sequences.  Returns one row per
    document::

        (doc_id, n_tokens, start_offset, first_seq, offset_in_first,
         last_seq, n_seqs)

    Scale design — the whole operator is one ordered prefix sum, and
    the naive expression (``Window.orderBy(id)`` with no partition
    spec) collapses the corpus onto a SINGLE reducer task; at 100 TB
    that is the job.  Instead the prefix sum is two-phase, the classic
    distributed scan:

      1. bucket documents by contiguous id range (``id div width`` —
         deterministic, no sampling, so the result is independent of
         physical partitioning);
      2. per-bucket token totals: one map-side-combinable groupBy of
         ~``n_buckets`` rows, then a cumulative sum over the TINY
         bucket table (a single-partition window over thousands of
         rows, not billions);
      3. broadcast-join the bucket prefix offsets back and compute the
         within-bucket running sum with a window PARTITIONED by bucket
         — every bucket scans in parallel.

    The output is invariant to ``n_buckets`` (prefix sums are
    associative; asserted in tests), so the knob is purely a
    parallelism dial — default is 4× the session's parallelism.  Dense
    ids give even buckets; a skewed id space only skews bucket SIZE,
    never correctness.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = docs.sparkSession
    if n_buckets is None:
        n_buckets = 4 * spark.sparkContext.defaultParallelism

    count_col = (
        F.col(token_count_col).cast("long")
        if token_count_col is not None
        else _token_count_col(text_col)
    )
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        count_col.alias("n_tokens"),
    )

    # bucket width from the id range — one tiny agg job, no sampling
    bounds = tok.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return spark.createDataFrame(
            [],
            "doc_id long, n_tokens long, start_offset long, "
            "first_seq long, offset_in_first long, last_seq long, "
            "n_seqs long",
        )
    span = int(bounds["hi"]) - int(bounds["lo"]) + 1
    width = max(1, -(-span // n_buckets))  # ceil
    lo = int(bounds["lo"])

    # integer `div`, not float `/`: a double quotient can round UP across
    # an integer boundary for very large id spans (2^53+ mantissa loss),
    # silently assigning a doc to the wrong bucket and corrupting the
    # prefix sum — `div` is exact for any long range
    bucketed = tok.withColumn(
        "bucket", F.expr(f"(doc_id - {lo}L) div {width}L")
    )

    # phase 1: per-bucket totals (map-side combine), cumsum over the
    # tiny bucket table — single-partition window over n_buckets rows
    from pyspark.sql import Window

    totals = bucketed.groupBy("bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w_buckets = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_buckets), F.lit(0)).alias(
            "bucket_offset"
        ),
    )

    # phase 2: within-bucket running sum, parallel across buckets
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        bucketed.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "start_offset",
            F.col("bucket_offset")
            + F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0)),
        )
    )

    L = F.lit(int(seq_len))
    first_seq = F.expr(f"start_offset div {int(seq_len)}")
    last_seq = F.when(
        F.col("n_tokens") > 0,
        F.expr(
            f"(start_offset + n_tokens - 1) div {int(seq_len)}"
        ),
    ).otherwise(first_seq)
    return start.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        first_seq.cast("long").alias("first_seq"),
        (F.col("start_offset") % L).cast("long").alias("offset_in_first"),
        last_seq.cast("long").alias("last_seq"),
        F.when(F.col("n_tokens") > 0, last_seq - first_seq + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_seqs"),
    )


def pack_bins_greedy(
    docs: DataFrame,
    seq_len: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "source",
) -> DataFrame:
    """Greedy whole-document bin packing within each stratum.

    Documents are taken in ``id_col`` order within each ``stratum_col``
    group; each is appended to the current bin unless its (capped)
    token count would overflow ``seq_len``, which closes the bin and
    starts the next.  Documents longer than ``seq_len`` occupy a bin
    alone with ``eff_tokens = seq_len`` (truncation is the consumer's
    choice; the cap keeps every bin's fill ≤ ``seq_len``).

    Returns one row per document::

        (doc_id, source, n_tokens, eff_tokens, bin_id, offset_in_bin)

    ``bin_id`` counts from 0 within each stratum.

    Scale shape: the recurrence is sequential per stratum but the
    strata are independent — ``applyInPandas`` runs one numpy pass per
    source group, state never crosses executors, and the only shuffle
    is the groupBy's hash exchange of narrow (id, source, count) rows
    (the text column is dropped before the shuffle).  A corpus with S
    sources runs S-way parallel regardless of corpus size; a single
    giant stratum is the operator's documented limit (use
    ``pack_sequence_coords`` there — pretraining-style packing has no
    per-stratum order dependence).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    cap = int(seq_len)

    narrow = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(stratum_col).alias("source"),
        _token_count_col(text_col).alias("n_tokens"),
    )

    schema = (
        "doc_id long, source string, n_tokens long, eff_tokens long, "
        "bin_id long, offset_in_bin long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(
            drop=True
        )
        eff = pdf["n_tokens"].clip(upper=cap).astype("int64")
        bins, offs = [], []
        bin_id, fill = 0, 0
        for t in eff:
            if fill + t > cap:
                bin_id += 1
                fill = 0
            offs.append(fill)
            bins.append(bin_id)
            fill += t
        pdf["eff_tokens"] = eff
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["offset_in_bin"] = pd.Series(offs, dtype="int64")
        return pdf[
            [
                "doc_id",
                "source",
                "n_tokens",
                "eff_tokens",
                "bin_id",
                "offset_in_bin",
            ]
        ]

    return narrow.groupBy("source").applyInPandas(pack, schema)
