"""BPE merge-training wall at corpus scale.

    python scripts/bench_bpe.py [sf] [num_merges]

Measures, on the datagen sf documents corpus:
  * the one-off word-count scan (the only pass over corpus TEXT);
  * per-iteration wall of the merge loop (pair groupBy + argmax +
    literal-replace projection over the DISTINCT-WORD table) — the
    number that demonstrates iterations are vocabulary-bounded, not
    corpus-bounded;
  * a final bpe_encode pass applying all learned merges.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from neo4j_graphrag_python_spark import datagen  # noqa: E402
from neo4j_graphrag_python_spark.operators.training import (  # noqa: E402
    bpe_encode,
    bpe_train_merges,
    bpe_word_counts,
)
from neo4j_graphrag_python_spark.session import build_spark  # noqa: E402


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "bench-bpe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = datagen.ensure_tables(sf)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    t0 = time.monotonic()
    n_words = bpe_word_counts(docs).count()
    t_words = time.monotonic() - t0

    t0 = time.monotonic()
    out, merges = bpe_train_merges(docs, num_merges=k)
    t_train = time.monotonic() - t0

    t0 = time.monotonic()
    n_toks = (
        bpe_encode(docs, merges)
        .agg({"n_bpe_tokens": "sum"})
        .collect()[0][0]
    )
    t_encode = time.monotonic() - t0

    print(
        json.dumps(
            {
                "sf": sf,
                "docs": n_docs,
                "distinct_words": n_words,
                "merges": len(merges),
                "word_count_scan_s": round(t_words, 2),
                "train_wall_s": round(t_train, 2),
                "per_iteration_s": round(t_train / max(len(merges), 1), 3),
                "encode_wall_s": round(t_encode, 2),
                "encoded_tokens": int(n_toks),
                "top_merges": [(a, b, c) for a, b, c in merges[:8]],
                "loadavg_1m": round(os.getloadavg()[0], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
