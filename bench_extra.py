"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§1.5).

The driver's ``bench.py`` is frozen; this harness times the SAME query
callables with the SAME ``.count()`` methodology, one query at a time,
so an optimization's effect is visible without the pipeline's cache
state or attempt-selection in the way.  It can also capture
``.explain("formatted")`` into ``plans/r07/<query>_<suffix>.txt`` and
run a noop-sink variant (computes every column, guide §1.4).

    python bench_extra.py                         # time all, 3 repeats
    python bench_extra.py --queries a,b --repeats 5
    python bench_extra.py --explain plans/r07 --suffix before
    python bench_extra.py --noop                  # noop sink instead of count

Prints one JSON line: {"queries": {name: min_sec}, "samples": {...},
"loadavg": [...], "repeats": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graphrag_python_spark import transcripts as tr  # noqa: E402
from neo4j_graphrag_python_spark.session import build_spark  # noqa: E402

BENCH_QUERIES = [
    "events_sessionize",
    "top_customers_by_revenue",
    "ann_topk_bruteforce",
    "lineitem_pricing_summary",
    "dedup_minhash_pairs",
    "embedding_neardup_ivf",
    "doc_contamination",
    "doc_dup_spans",
    "doc_dedup_spans_applied",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "corpus_curate",
    "quality_train_weights",
    "doc_lm_perplexity",
]


def _extra_queries(spark, sf_dir):
    """The two bench.py rows that bypass the registry (sf-table variants)."""
    import __spark_entry__ as em
    from neo4j_graphrag_python_spark.operators.dedup import embedding_neardup_lsh
    from neo4j_graphrag_python_spark.operators.text_analysis import pii_scrub

    def lsh_sf(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        dim = len(emb.select("embedding").head()["embedding"])
        return embedding_neardup_lsh(
            emb, dim=dim, threshold=em.ELSH_THRESHOLD,
            target_recall=em.ELSH_TARGET_RECALL,
        )

    def pii_sf(spark, sf_dir):
        return pii_scrub(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    return {"embedding_neardup_lsh": lsh_sf, "doc_pii_scrub": pii_sf}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir to write plans into")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tr.ensure_transcripts(sf_dir)
    spark = build_spark(
        app_name="kgspark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 2 * cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    registry = dict(em.queries())
    registry.update(_extra_queries(spark, sf_dir))
    names = (
        args.queries.split(",") if args.queries else
        BENCH_QUERIES + ["embedding_neardup_lsh", "doc_pii_scrub"]
    )

    if args.explain:
        out_dir = Path(args.explain)
        out_dir.mkdir(parents=True, exist_ok=True)
        import io
        from contextlib import redirect_stdout

        for name in names:
            df = registry[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{args.suffix}.txt").write_text(buf.getvalue())
            print(f"wrote {name}_{args.suffix}.txt", file=sys.stderr)
        spark.stop()
        return

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    loadavgs = []
    for r in range(args.repeats):
        loadavgs.append(round(os.getloadavg()[0], 2))
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} [r{r}]")
            # time construction + action together — bench.py's timed()
            # wraps fn(spark, sf_dir).count(), and construction can run
            # real jobs (lazy localCheckpoints materialize their
            # exchanges when AQE resolves the plan)
            t0 = time.perf_counter()
            df = registry[name](spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = round(time.perf_counter() - t0, 3)
            samples.setdefault(name, []).append(dt)
            spark.sparkContext.setJobDescription(None)
    for name, vals in samples.items():
        timings[name] = min(vals)
    spark.stop()
    print(json.dumps({
        "queries": timings,
        "samples": samples,
        "loadavg": loadavgs,
        "repeats": args.repeats,
        "mode": "noop" if args.noop else "count",
    }))


if __name__ == "__main__":
    main()
