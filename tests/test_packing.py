"""Sequence-packing operators: concat-and-chunk coordinates (two-phase
distributed prefix sum) and per-stratum greedy whole-doc bin packing."""

from __future__ import annotations

import random

import pytest

from neo4j_graphrag_python_spark.operators.packing import (
    pack_bins_greedy,
    pack_sequence_coords,
)


def _corpus(n: int, seed: int = 7) -> list[tuple[int, str, str]]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.choice([0, 1, 3, 17, 80, 300])
        text = " ".join(f"w{rng.randrange(50)}" for _ in range(k))
        if k and rng.random() < 0.2:
            text = "  " + text + "  "  # space padding → same count
            # (F.trim strips spaces, not tabs — same as the DuckDB
            # oracle's trim; tab-padded corpora count the empty token)
        rows.append((i, text, f"src{i % 5}"))
    return rows


def _expected_coords(rows, seq_len):
    out = {}
    offset = 0
    for i, text, _ in sorted(rows):
        n = len(text.split()) if text.strip() else 0
        first = offset // seq_len
        last = (offset + n - 1) // seq_len if n > 0 else first
        out[i] = (
            n,
            offset,
            first,
            offset % seq_len,
            last,
            (last - first + 1) if n > 0 else 0,
        )
        offset += n
    return out


def test_coords_match_straightline_replication(spark) -> None:
    rows = _corpus(120)
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["start_offset"],
            r["first_seq"],
            r["offset_in_first"],
            r["last_seq"],
            r["n_seqs"],
        )
        for r in pack_sequence_coords(df, 64).collect()
    }
    assert got == _expected_coords(rows, 64)


def test_coords_invariant_to_bucket_count(spark) -> None:
    """Prefix sums are associative — the bucket knob is a parallelism
    dial, never a semantics dial."""
    rows = _corpus(90, seed=11)
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    base = sorted(
        tuple(r) for r in pack_sequence_coords(df, 32, n_buckets=1).collect()
    )
    for nb in (3, 7, 64, 1000):
        alt = sorted(
            tuple(r)
            for r in pack_sequence_coords(df, 32, n_buckets=nb).collect()
        )
        assert alt == base, nb


def test_coords_sparse_ids_and_empty_frame(spark) -> None:
    rows = [(10, "a b c", "s"), (7000, "d e", "s"), (999999, "", "s")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        r["doc_id"]: (r["start_offset"], r["n_seqs"])
        for r in pack_sequence_coords(df, 4).collect()
    }
    # "d e" starts at offset 3 and straddles the seq-4 boundary → 2 seqs
    assert got == {10: (0, 1), 7000: (3, 2), 999999: (5, 0)}

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequence_coords(empty, 4).count() == 0
    with pytest.raises(ValueError):
        pack_sequence_coords(df, 0)


def test_coords_window_is_bucket_partitioned(spark) -> None:
    """The corpus-side window must be partitioned (parallel), not a
    global single-reducer orderBy."""
    df = spark.createDataFrame(_corpus(50), ["doc_id", "text", "source"])
    plan = (
        pack_sequence_coords(df, 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # phase-2 window runs partitioned by bucket
    assert "hashpartitioning(bucket" in plan, plan


def _expected_bins(rows, seq_len):
    out = {}
    by_src: dict[str, list] = {}
    for i, text, src in rows:
        by_src.setdefault(src, []).append((i, text))
    for src, docs in by_src.items():
        bin_id, fill = 0, 0
        for i, text in sorted(docs):
            n = len(text.split()) if text.strip() else 0
            eff = min(n, seq_len)
            if fill + eff > seq_len:
                bin_id += 1
                fill = 0
            out[i] = (src, n, eff, bin_id, fill)
            fill += eff
    return out


def test_bins_match_straightline_replication(spark) -> None:
    rows = _corpus(150, seed=3)
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        r["doc_id"]: (
            r["source"],
            r["n_tokens"],
            r["eff_tokens"],
            r["bin_id"],
            r["offset_in_bin"],
        )
        for r in pack_bins_greedy(df, 100).collect()
    }
    assert got == _expected_bins(rows, 100)


def test_bins_never_overflow_and_oversize_doc_is_capped(spark) -> None:
    rows = [
        (0, " ".join(["x"] * 10), "s"),
        (1, " ".join(["y"] * 500), "s"),  # longer than seq_len
        (2, " ".join(["z"] * 10), "s"),
        (3, "", "s"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["doc_id"]: r.asDict() for r in pack_bins_greedy(df, 64).collect()}
    assert out[1]["eff_tokens"] == 64 and out[1]["offset_in_bin"] == 0
    # fills per bin never exceed seq_len
    fills: dict[int, int] = {}
    for r in out.values():
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["eff_tokens"]
    assert all(v <= 64 for v in fills.values()), fills
    # empty doc lands in a bin without advancing fill
    assert out[3]["eff_tokens"] == 0


def test_coords_exact_bucketing_at_huge_id_magnitudes(spark) -> None:
    """Bucket assignment must use integer `div`, not float division: at
    doc_id magnitudes past 2^53 a double quotient loses mantissa bits
    and can round UP across an integer boundary, putting a doc in the
    wrong bucket and corrupting the prefix sum.  Straight-line expected
    coords (and n_buckets invariance) pin the exact behavior."""
    base = 2**53
    step = 4_099_990_001  # odd, huge span → width >> 2^32
    rows = [
        (base + i * step, f"{'tok ' * (i % 7)}".strip(), "s")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    exp = _expected_coords(rows, 16)
    for nb in (1, 7, 33):
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["start_offset"],
                r["first_seq"],
                r["offset_in_first"],
                r["last_seq"],
                r["n_seqs"],
            )
            for r in pack_sequence_coords(df, 16, n_buckets=nb).collect()
        }
        assert got == exp
