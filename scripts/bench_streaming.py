"""Throughput bench for the Structured Streaming KG path: the sf0.1
transcripts corpus is re-written as many small parquet files (so
``maxFilesPerTrigger`` yields a multi-micro-batch stream), then
``stream_kg_pipeline`` (foreachBatch → full KG pipeline → append sinks)
drains it with an availableNow trigger.  Reports micro-batch count,
wall, and transcript-rows/sec + triples/sec — the number the streaming
design claims have lacked (state survival is tested in
tests/test_stateful_stream.py; this is the speed face).

Usage: python scripts/bench_streaming.py [sf] [n_files] [files_per_trigger] [sink]
  (defaults 0.1 64 8 parquet_append; sink ∈ parquet_append / catalog_merge /
   catalog_merge_incremental — the catalog sinks measure the per-batch
   MERGE/resolution overhead on top of the same pipeline)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from neo4j_graphrag_python_spark.operators.extractor import (  # noqa: E402
    demo_rules,
    regex_extractor,
)
from neo4j_graphrag_python_spark.schema import demo_schema  # noqa: E402
from neo4j_graphrag_python_spark.session import build_spark  # noqa: E402
from neo4j_graphrag_python_spark.streaming.stream import (  # noqa: E402
    read_transcript_stream,
    stream_kg_pipeline,
)
from neo4j_graphrag_python_spark.transcripts import (  # noqa: E402
    ensure_transcripts,
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    per_trigger = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    sink = sys.argv[4] if len(sys.argv) > 4 else "parquet_append"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "bench-stream", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = ensure_transcripts(f"/root/testdata/sf{sf}")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_"))
    try:
        feed = str(work / "feed")
        tr = spark.read.parquet(src)
        n_rows = tr.count()
        n_convs = tr.select("conv_id").distinct().count()
        # conv-aligned file split: a conversation must not straddle
        # micro-batches (the pipeline assembles documents per conv)
        tr.repartition(n_files, "conv_id").write.mode("overwrite").parquet(
            feed
        )

        stream = read_transcript_stream(
            spark, feed, max_files_per_trigger=per_trigger
        )
        db = None
        if sink == "parquet_append":
            out = str(work / "out")
        else:
            # unique db per run: a crashed earlier run can orphan the
            # managed-table location, which CREATE then refuses
            db = f"bench_stream_{os.getpid()}"
            spark.sql(f"CREATE DATABASE {db}")
            out = f"{db}.kg"
        t0 = time.time()
        q = stream_kg_pipeline(
            stream,
            regex_extractor(demo_rules()),
            output_dir=out,
            checkpoint_dir=str(work / "ckpt"),
            schema=demo_schema(),
            trigger_once=True,
            sink=sink,
            incremental_fuzzy_threshold=(
                0.8 if sink == "catalog_merge_incremental" else None
            ),
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 2)
        batches = q.lastProgress["batchId"] + 1 if q.lastProgress else 0

        if sink == "parquet_append":
            nodes = spark.read.parquet(str(work / "out" / "nodes"))
            edges = spark.read.parquet(str(work / "out" / "edges"))
        else:
            nodes = spark.read.table(f"{out}_nodes")
            edges = spark.read.table(f"{out}_edges")
        n_nodes, n_edges = nodes.count(), edges.count()
        print(
            json.dumps(
                {
                    "sf": sf,
                    "sink": sink,
                    "transcript_rows": n_rows,
                    "conversations": n_convs,
                    "feed_files": n_files,
                    "files_per_trigger": per_trigger,
                    "micro_batches": batches,
                    "wall_s": wall,
                    "rows_per_sec": round(n_rows / wall, 1),
                    "convs_per_sec": round(n_convs / wall, 1),
                    "nodes_written": n_nodes,
                    "edges_written": n_edges,
                    "loadavg_1m": round(os.getloadavg()[0], 1),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        if db is not None:
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.stop()


if __name__ == "__main__":
    main()
