"""IVF-PQ vs flat-PQ vs k-means-IVF recall/latency at matched budgets.

    python scripts/bench_ivfpq.py [corpus] [cells] [nprobe] [rescore] [nq]

corpus: "clustered" (the 60k clustered fixture used by the knn bench) or
an sf float for datagen embeddings.  Measures, per configuration:

  * index build wall (fit + assign + persist);
  * per-query wall and recall@10 vs brute-force cosine;
  * average candidate count actually scanned (probed-cell population for
    the IVF rungs, the full corpus for flat PQ) — the "matched budget"
    axis: IVF and IVF-PQ probe the SAME cells, flat PQ and IVF-PQ share
    the SAME rescore budget, so the deltas isolate (a) what residual
    quantization loses inside a cell and (b) what coarse probing loses
    vs scanning everything.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graphrag_python_spark.operators.similarity import (  # noqa: E402
    build_ivf_kmeans_index,
    build_ivfpq_index,
    build_pq_index,
    topk_bruteforce,
    topk_ivf_kmeans,
    topk_ivfpq,
    topk_pq,
)
from neo4j_graphrag_python_spark.session import build_spark  # noqa: E402


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "clustered"
    cells = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rescore = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    nq = int(sys.argv[5]) if len(sys.argv) > 5 else 10
    m, ks = 16, 16

    spark = build_spark(app_name="bench-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    if corpus == "clustered":
        path = str(REPO / ".fixtures" / "clustered60000" / "embeddings.parquet")
    else:
        from neo4j_graphrag_python_spark import datagen

        path = datagen.ensure_embeddings(float(corpus))
    emb = spark.read.parquet(path).persist()
    n = emb.count()
    print(
        f"corpus={corpus} n={n} cells={cells} nprobe={nprobe} "
        f"rescore={rescore} m={m} ks={ks} queries={nq}"
    )

    t0 = time.monotonic()
    ivf_indexed, cents = build_ivf_kmeans_index(
        emb, num_centroids=cells, sample_n=4096
    )
    ivf_indexed = ivf_indexed.persist()
    ivf_indexed.count()
    t_ivf_build = time.monotonic() - t0

    t0 = time.monotonic()
    pq_codes, pq_books = build_pq_index(
        emb, m=m, num_centroids=ks, sample_n=4096
    )
    pq_codes = pq_codes.persist()
    pq_codes.count()
    t_pq_build = time.monotonic() - t0

    t0 = time.monotonic()
    coded, cents2, books2 = build_ivfpq_index(
        emb, num_centroids=cells, m=m, pq_centroids=ks, sample_n=4096,
        centroids=cents,
    )
    coded = coded.persist()
    coded.count()
    t_ivfpq_build = time.monotonic() - t0
    print(
        f"build wall: ivf={t_ivf_build:.1f}s pq={t_pq_build:.1f}s "
        f"ivfpq={t_ivfpq_build:.1f}s"
    )

    cell_pop = {
        r["bucket"]: r["c"]
        for r in coded.groupBy("bucket").agg(F.count("*").alias("c")).collect()
    }

    qrows = emb.orderBy("vec_id").limit(nq).collect()
    stats = {k: [0.0, 0.0, 0] for k in ("ivf", "pq", "ivfpq")}  # wall, recall, cands
    for r in qrows:
        qv = r["embedding"]
        exact = {x["id"] for x in topk_bruteforce(emb, qv, k=10).collect()}

        q = [float(x) for x in qv]
        qn = sum(x * x for x in q) ** 0.5 or 1.0
        qu = [x / qn for x in q]
        dots = [sum(a * b for a, b in zip(qu, c)) for c in cents]
        probes = sorted(range(len(cents)), key=lambda j: (-dots[j], j))[:nprobe]
        probed_pop = sum(cell_pop.get(p, 0) for p in probes)

        t0 = time.monotonic()
        got = {
            x["id"]
            for x in topk_ivf_kmeans(
                ivf_indexed, cents, qv, k=10, nprobe=nprobe
            ).collect()
        }
        stats["ivf"][0] += time.monotonic() - t0
        stats["ivf"][1] += len(got & exact) / 10
        stats["ivf"][2] += probed_pop

        t0 = time.monotonic()
        got = {
            x["id"]
            for x in topk_pq(pq_codes, emb, pq_books, qv, k=10,
                             rescore=rescore).collect()
        }
        stats["pq"][0] += time.monotonic() - t0
        stats["pq"][1] += len(got & exact) / 10
        stats["pq"][2] += n

        t0 = time.monotonic()
        got = {
            x["id"]
            for x in topk_ivfpq(
                coded, emb, cents, books2, qv, k=10, nprobe=nprobe,
                rescore=rescore,
            ).collect()
        }
        stats["ivfpq"][0] += time.monotonic() - t0
        stats["ivfpq"][1] += len(got & exact) / 10
        stats["ivfpq"][2] += probed_pop

    print("| path | per-query wall (s) | recall@10 | avg candidates scanned |")
    print("|---|---|---|---|")
    for name in ("ivf", "pq", "ivfpq"):
        w, rec, c = stats[name]
        print(
            f"| {name} | {w / nq:.2f} | {rec / nq:.3f} | {c // nq} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
