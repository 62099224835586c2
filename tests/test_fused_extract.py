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


def test_chunk_rows_match_staged_splitter(spark) -> None:
    """chunks_view over the fused pass (emit_chunk_rows) must equal
    split_fixed_size's table row-for-row — one corpus pass, same chunks."""
    from neo4j_graphrag_python_spark import transcripts as tr
    from neo4j_graphrag_python_spark.operators.assemble import assemble_documents
    from neo4j_graphrag_python_spark.operators.extractor import (
        chunks_view,
        demo_rules,
        extract_from_documents,
        regex_extractor,
    )
    from neo4j_graphrag_python_spark.operators.splitter import split_fixed_size
    from neo4j_graphrag_python_spark.types import SplitterConfig

    docs = assemble_documents(
        spark.read.parquet(tr.ensure_transcripts("/root/testdata/sf0.001"))
    )
    cfg = SplitterConfig(600, 200, approximate=True)
    rows = extract_from_documents(
        docs, regex_extractor(demo_rules()), splitter_config=cfg,
        emit_chunk_rows=True,
    )
    got = chunks_view(rows)
    want = split_fixed_size(docs, cfg)
    cols = want.columns
    assert sorted(got.columns) == sorted(cols)
    a = {tuple(r[c] for c in cols) for r in got.collect()}
    b = {tuple(r[c] for c in cols) for r in want.collect()}
    assert a == b and len(a) > 100
