"""Recall/latency dial for the bucketed ANN index: recall@10 vs
probe_hamming, against brute-force cosine, over the sf0.01 embeddings.

Prints one markdown table row per (num_planes, probe_hamming); used to
produce the table in BENCH.md.  Usage:

    python scripts/ann_recall_curve.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graphrag_python_spark.operators.similarity import (  # noqa: E402
    build_ann_index,
    topk_ann,
    topk_bruteforce,
)
from neo4j_graphrag_python_spark.session import build_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_spark(app_name="ann-curve", master="local[8]",
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n = emb.count()
    query_ids = [r["vec_id"] for r in emb.select("vec_id").limit(20).collect()]
    qvecs = {
        r["vec_id"]: r["embedding"]
        for r in emb.where(F.col("vec_id").isin(query_ids)).collect()
    }
    exact = {}
    for qid, qv in qvecs.items():
        exact[qid] = {r["id"] for r in topk_bruteforce(emb, qv, k=10).collect()}

    print(f"n_vectors={n}  queries={len(qvecs)}  k=10")
    print("| planes | probe_hamming | buckets probed / total | recall@10 | avg candidates |")
    print("|---|---|---|---|---|")
    import itertools

    for planes_n in (6, 8):
        indexed, planes = build_ann_index(emb, dim=64, num_planes=planes_n)
        indexed = indexed.persist()
        indexed.count()
        for probe in (0, 1, 2, 3):
            n_probes = sum(
                1
                for r in range(probe + 1)
                for _ in itertools.combinations(range(planes_n), r)
            )
            hits, cands = 0, 0
            for qid, qv in qvecs.items():
                res = topk_ann(indexed, planes, qv, k=10, probe_hamming=probe)
                got = {r["id"] for r in res.collect()}
                hits += len(got & exact[qid])
                qb = 0
                for i, h in enumerate(planes):
                    if sum(a * b for a, b in zip(qv, h)) >= 0:
                        qb |= 1 << i
                probes = {qb}
                for r in range(1, probe + 1):
                    for flips in itertools.combinations(range(planes_n), r):
                        b = qb
                        for f in flips:
                            b ^= 1 << f
                        probes.add(b)
                cands += indexed.where(F.col("bucket").isin(list(probes))).count()
            recall = hits / (10 * len(qvecs))
            print(
                f"| {planes_n} | {probe} | {n_probes}/{2**planes_n} "
                f"| {recall:.3f} | {cands // len(qvecs)} |"
            )
        indexed.unpersist()

    # k-means IVF (data-aware cells) at matched candidate budgets
    from neo4j_graphrag_python_spark.operators.similarity import (
        build_ivf_kmeans_index,
        topk_ivf_kmeans,
    )

    print("| centroids | nprobe | cells probed / total | recall@10 | avg candidates |")
    print("|---|---|---|---|---|")
    for n_centroids in (12, 16):
        indexed, centroids = build_ivf_kmeans_index(
            emb, num_centroids=n_centroids, sample_n=2048
        )
        indexed = indexed.persist()
        indexed.count()
        for nprobe in (1, 2, 3, 4):
            hits, cands = 0, 0
            for qid, qv in qvecs.items():
                res = topk_ivf_kmeans(indexed, centroids, qv, k=10, nprobe=nprobe)
                got = {r["id"] for r in res.collect()}
                hits += len(got & exact[qid])
                dots = [sum(a * b for a, b in zip(qv, c)) for c in centroids]
                probes = sorted(
                    range(len(centroids)), key=lambda j: (-dots[j], j)
                )[:nprobe]
                cands += indexed.where(F.col("bucket").isin(probes)).count()
            recall = hits / (10 * len(qvecs))
            print(
                f"| {n_centroids} | {nprobe} | {nprobe}/{n_centroids} "
                f"| {recall:.3f} | {cands // len(qvecs)} |"
            )
        indexed.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
