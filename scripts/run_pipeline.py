"""spark-submit entrypoint — the north-rule ship path.

    zip -qr kgspark.zip neo4j_graphrag_python_spark
    spark-submit --py-files kgspark.zip scripts/run_pipeline.py \
        --input  <iceberg table name | parquet path> \
        --output <dir> \
        [--schema schema.json] [--chunk-size 4000] [--chunk-overlap 200] \
        [--checkpoint-dir <dir>] [--resolver exact|fuzzy|semantic]

Writes canonical ``nodes/`` and ``edges/`` parquet under --output via the
resumable bucket-manifest writer, plus a ``metrics.json``.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--schema", default=None, help="GraphSchema JSON/YAML path")
    ap.add_argument("--chunk-size", type=int, default=4000)
    ap.add_argument("--chunk-overlap", type=int, default=200)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument(
        "--resolver", choices=["exact", "fuzzy", "semantic", "none"], default="exact"
    )
    ap.add_argument("--demo-extractor", action="store_true",
                    help="use the deterministic regex extractor (no LLM)")
    args = ap.parse_args()

    from neo4j_graphrag_python_spark.operators.extractor import (
        demo_rules,
        regex_extractor,
    )
    from neo4j_graphrag_python_spark.operators.writer import write_resumable
    from neo4j_graphrag_python_spark.plans.pipeline import (
        run_kg_pipeline,
        run_similarity_resolution,
        triples_view,
    )
    from neo4j_graphrag_python_spark.schema import GraphSchema, demo_schema
    from neo4j_graphrag_python_spark.sources.tables import read_transcripts
    from neo4j_graphrag_python_spark.types import PipelineConfig, SplitterConfig

    spark = SparkSession.builder.getOrCreate()
    t0 = time.time()
    transcripts = read_transcripts(spark, args.input)
    schema = (
        GraphSchema.load(args.schema)
        if args.schema
        else (demo_schema() if args.demo_extractor else None)
    )
    cfg = PipelineConfig(
        splitter=SplitterConfig(args.chunk_size, args.chunk_overlap),
        checkpoint_dir=args.checkpoint_dir,
        perform_entity_resolution=args.resolver == "exact",
    )
    extractor = regex_extractor(demo_rules())  # swap: llm_extractor(...)
    result = run_kg_pipeline(transcripts, extractor, schema, cfg)
    if args.resolver in ("fuzzy", "semantic"):
        result = run_similarity_resolution(result, method=args.resolver)

    write_resumable(result.nodes, f"{args.output}/nodes", key_col="id")
    write_resumable(
        result.edges.withColumn("edge_key", result.edges.start_node_id),
        f"{args.output}/edges",
        key_col="edge_key",
    )
    n_triples = triples_view(result.nodes, result.edges).count()
    metrics = {
        "wall_sec": round(time.time() - t0, 2),
        "canonical_triples": n_triples,
        "resolution": (
            vars(result.resolution_stats) if result.resolution_stats else None
        ),
    }
    with open(f"{args.output}/metrics.json", "w") as fh:
        json.dump(metrics, fh)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
