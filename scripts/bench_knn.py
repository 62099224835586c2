"""Bench the k-NN join rungs at scale: exact blocked-GEMM vs IVF-celled.

Usage:
    python scripts/bench_knn.py [sf] [k] [num_centroids] [nprobe]

Runs ``knn_join`` (exact; cached to .fixtures/sf<sf>/knn_exact_k<k>.parquet
so repeat invocations only pay the approximate side) and ``knn_join_ivf``
on the generated sf embeddings, reporting wall seconds and the IVF rung's
neighbor-set recall vs the exact answer (pair-level: |approx ∩ exact| /
|exact|, computed as a Spark join — no driver materialization of the
300k-row answers).
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
    knn_join,
    knn_join_ivf,
)
from neo4j_graphrag_python_spark.session import build_spark


def ensure_clustered(n: int, dim: int = 64, n_clusters: int = 240) -> str:
    """A clustered corpus of the same size as the sf table — tight
    gaussian clusters around unit-norm centers, the data regime IVF
    search exists for; the sf embeddings are deliberately diffuse,
    where NO cell blocking has sparse structure (the same regime split
    measured for embedding_neardup).  σ is per-DIMENSION: noise norm is
    σ·√dim, so at dim=64 it must sit well under the unit center norm —
    σ=0.05 → noise norm 0.4 → same-cluster cosine ≈0.9 (σ=0.3 looks
    small but its norm-2.4 noise swamps the center: measured recall
    0.33, i.e. effectively diffuse)."""
    out = datagen.FIXTURE_ROOT / f"clustered{n}" / "embeddings.parquet"
    if out.exists():
        return str(out)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    centers = rng.normal(0, 1, (n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, n)
    vecs = centers[labels] + rng.normal(0, 0.05, (n, dim))
    out.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v.astype("float32") for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        out,
    )
    return str(out)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    num_centroids = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    nprobe = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    clustered = len(sys.argv) > 5 and sys.argv[5] == "--clustered"

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if clustered:
        emb_path = ensure_clustered(60000)
        tag = "clustered60000"
    else:
        emb_path = datagen.ensure_embeddings(sf)
        tag = f"sf{sf:g}"
    emb = spark.read.parquet(emb_path)
    n = emb.count()
    print(f"{tag} n={n} k={k} C={num_centroids} nprobe={nprobe}")

    exact_path = datagen.FIXTURE_ROOT / tag / f"knn_exact_k{k}.parquet"
    if not exact_path.exists():
        t0 = time.monotonic()
        knn_join(emb, k=k).write.parquet(str(exact_path))
        print(f"knn_join (exact)      wall={time.monotonic() - t0:8.2f}s")
    exact = spark.read.parquet(str(exact_path))

    t0 = time.monotonic()
    approx = knn_join_ivf(
        emb, k=k, num_centroids=num_centroids, nprobe=nprobe
    )
    n_approx = approx.count()
    wall = time.monotonic() - t0
    print(f"knn_join_ivf          wall={wall:8.2f}s rows={n_approx}")

    hits = approx.join(exact, ["id", "neighbor_id"], "left_semi").count()
    n_exact = exact.count()
    print(
        f"recall vs exact: {hits}/{n_exact} = {hits / n_exact:.4f} "
        f"(exact rows {n_exact})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
