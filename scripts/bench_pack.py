"""Bench the packing prefix-sum core: two-phase vs the naive global
window, at row counts where the single-reducer shape starts to matter.

    python scripts/bench_pack.py [n_rows] [seq_len]

The input is a synthetic (doc_id, n_tokens) table generated with
``spark.range`` (deterministic token counts from the id), so the
measured stage is exactly the ordered prefix sum + coordinate math —
no tokenization in the loop.  The naive variant is what a straight
SQL translation produces: ``SUM(n) OVER (ORDER BY doc_id ...)`` with
no PARTITION BY, which Spark executes by moving EVERY row to one
reducer task.  The two-phase variant is ``pack_sequence_coords``.
Both results are asserted identical before timing is reported.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window, functions as F

from neo4j_graphrag_python_spark.operators.packing import (
    pack_sequence_coords,
)
from neo4j_graphrag_python_spark.session import build_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    seq_len = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    tok = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            (F.pmod(F.col("id") * 2654435761, F.lit(997)) + 1)
            .cast("long")
            .alias("n_tokens"),
        )
        .persist()
    )
    tok.count()
    print(f"n={n} seq_len={seq_len}")

    t0 = time.monotonic()
    two_phase = pack_sequence_coords(
        tok, seq_len, token_count_col="n_tokens"
    )
    agg2 = two_phase.agg(
        F.count("*"), F.sum("start_offset"), F.max("last_seq")
    ).collect()[0]
    t_two = time.monotonic() - t0
    print(f"two-phase: {t_two:.2f}s  {tuple(agg2)}")

    t0 = time.monotonic()
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = tok.select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias(
            "start_offset"
        ),
    )
    agg1 = naive.agg(
        F.count("*"), F.sum("start_offset")
    ).collect()[0]
    t_naive = time.monotonic() - t0
    print(f"naive global window: {t_naive:.2f}s  {tuple(agg1)}")

    assert agg1[0] == agg2[0] and agg1[1] == agg2[1], (agg1, agg2)
    print(f"speedup: {t_naive / t_two:.2f}x  (results identical)")
    spark.stop()


if __name__ == "__main__":
    main()
