"""Bench the numpy-vectorized k-means codebook fit at IVF scale
(k=256 on a 50k-vector sample — the cell count a 100 TB index needs,
where the round-3 pure-Python triple loop took minutes-to-hours), then
the recall@10 curve of the k=256 IVF-kmeans index on the sf1 vectors
vs brute-force cosine.

Usage: python scripts/bench_kmeans_fit.py [k] [sample_n]
  (defaults 256 50000; sample drawn from sf3's 60k vectors)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graphrag_python_spark import datagen  # noqa: E402
from neo4j_graphrag_python_spark.operators.similarity import (  # noqa: E402
    build_ivf_kmeans_index,
    fit_kmeans_centroids,
    sample_vectors,
    topk_bruteforce,
    topk_ivf_kmeans,
)
from neo4j_graphrag_python_spark.session import build_spark  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sample_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "bench-kmfit", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf3 = datagen.ensure_tables(3.0)
    big = spark.read.parquet(f"{sf3}/embeddings.parquet")
    sample = sample_vectors(big, sample_n)
    t0 = time.time()
    centroids = fit_kmeans_centroids(sample, num_centroids=k)
    fit_wall = round(time.time() - t0, 2)

    # recall@10 of the k-cell IVF index on the sf1 corpus (own codebook,
    # same seed/iters — the fit cost above is what it would pay)
    sf1 = datagen.ensure_tables(1.0)
    emb = spark.read.parquet(f"{sf1}/embeddings.parquet").persist()
    n = emb.count()
    t0 = time.time()
    c1 = fit_kmeans_centroids(sample_vectors(emb, sample_n), num_centroids=k)
    fit1_wall = round(time.time() - t0, 2)
    indexed, _ = build_ivf_kmeans_index(emb, centroids=c1)
    indexed = indexed.persist()
    indexed.count()

    qrows = emb.orderBy("vec_id").limit(20).collect()
    recalls = {}
    for nprobe in (1, 2, 4, 8):
        hits = tot = 0
        for r in qrows:
            truth = {
                x["id"]
                for x in topk_bruteforce(emb, r["embedding"], k=10).collect()
            }
            got = {
                x["id"]
                for x in topk_ivf_kmeans(
                    indexed, c1, r["embedding"], k=10, nprobe=nprobe
                ).collect()
            }
            hits += len(truth & got)
            tot += len(truth)
        recalls[f"nprobe_{nprobe}"] = round(hits / tot, 3)

    print(
        json.dumps(
            {
                "k": k,
                "sample_n": len(sample),
                "dim": len(sample[0]),
                "fit_wall_s_sf3_sample": fit_wall,
                "fit_wall_s_sf1_sample": fit1_wall,
                "sf1_vectors": n,
                "recall_at_10": recalls,
                "candidate_fraction_per_probe": round(1.0 / k, 4),
                "loadavg_1m": round(os.getloadavg()[0], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
