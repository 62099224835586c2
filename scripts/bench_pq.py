"""Bench product-quantization ANN at sf ≥ 1 vector counts.

    python scripts/bench_pq.py [sf] [m] [ks] [rescore] [n_queries]

Measures, on the generated sf embeddings (datagen):
  * codebook fit + corpus code assignment (one-off index build);
  * per-query ADC top-10 wall (averaged over n_queries query vectors)
    vs brute-force cosine top-10 wall on the same vectors;
  * recall@10 of the PQ path vs brute force (set overlap).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from neo4j_graphrag_python_spark import datagen
from neo4j_graphrag_python_spark.operators.similarity import (
    build_pq_index,
    topk_bruteforce,
    topk_pq,
)
from neo4j_graphrag_python_spark.session import build_spark


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ks = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    rescore = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    n_queries = int(sys.argv[5]) if len(sys.argv) > 5 else 10

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(datagen.ensure_embeddings(sf))
    n = emb.count()
    print(f"sf={sf:g} n={n} m={m} ks={ks} rescore={rescore}")

    t0 = time.monotonic()
    codes, books = build_pq_index(emb, m=m, num_centroids=ks, sample_n=2048)
    codes = codes.persist()
    codes.count()
    print(f"index build (fit + assign + persist): {time.monotonic()-t0:.2f}s")

    qrows = emb.where(F.col("vec_id") < n_queries).collect()
    recalls, t_pq, t_bf = [], 0.0, 0.0
    for r in qrows:
        qid, qv = r["vec_id"], r["embedding"]
        t0 = time.monotonic()
        approx = {
            x["id"]
            for x in topk_pq(
                codes.where(F.col("id") != qid),
                emb.where(F.col("vec_id") != qid),
                books,
                qv,
                k=10,
                rescore=rescore,
            ).collect()
        }
        t_pq += time.monotonic() - t0
        t0 = time.monotonic()
        exact = {
            x["id"]
            for x in topk_bruteforce(
                emb.where(F.col("vec_id") != qid), qv, k=10
            ).collect()
        }
        t_bf += time.monotonic() - t0
        recalls.append(len(approx & exact) / 10)
    print(
        f"per-query wall: pq={t_pq/len(qrows):.2f}s "
        f"brute={t_bf/len(qrows):.2f}s  "
        f"recall@10: {sum(recalls)/len(recalls):.3f} "
        f"(min {min(recalls):.1f} over {len(qrows)} queries)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
