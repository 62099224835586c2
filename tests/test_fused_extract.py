"""Fused split+extract must equal the staged path exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graphrag_python_spark import transcripts as tr
from neo4j_graphrag_python_spark.operators.assemble import assemble_documents
from neo4j_graphrag_python_spark.operators.extractor import (
    demo_rules,
    extract_from_documents,
    extract_graph_rows,
    regex_extractor,
)
from neo4j_graphrag_python_spark.operators.splitter import split_fixed_size
from neo4j_graphrag_python_spark.types import SplitterConfig


@pytest.fixture(scope="module")
def documents(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("fused") / "t.parquet"
    tr.write_transcripts(path, 0.0002)
    return assemble_documents(spark.read.parquet(str(path))).persist()


def rows_key(df):
    return sorted(
        (
            r["kind"],
            r["id"],
            r["label"],
            tuple(sorted((r["properties"] or {}).items())),
            r["start_node_id"],
            r["end_node_id"],
            r["type"],
            r["conv_id"],
            r["chunk_uid"],
        )
        for r in df.collect()
    )


def test_fused_equals_staged(documents) -> None:
    cfg = SplitterConfig(600, 200, approximate=True)
    fn = regex_extractor(demo_rules())
    staged = extract_graph_rows(split_fixed_size(documents, cfg), fn)
    fused = extract_from_documents(documents, fn, splitter_config=cfg)
    assert rows_key(staged) == rows_key(fused)
    assert fused.where(F.col("kind") == "node").count() > 0
