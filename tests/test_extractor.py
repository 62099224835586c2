"""Extractor stage semantics — id namespacing, chunk_index property,
FROM_CHUNK edges, OnError paths (reference
test_entity_relation_extractor.py:38-229 analogs)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from neo4j_graphrag_python_spark.operators.extractor import (
    ExtractionError,
    demo_rules,
    extract_graph_rows,
    parse_extraction,
    regex_extractor,
    split_graph_rows,
)
from neo4j_graphrag_python_spark.types import CHUNKS_SCHEMA


def make_chunks(spark, texts):
    rows = [
        (f"uid{i}", "c1", i, 0, len(t), t) for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, CHUNKS_SCHEMA)


def static_extractor(payload: str):
    def run(texts):
        return [payload for _ in texts]

    return run


def test_extract_namespaces_ids_and_adds_chunk_index(spark) -> None:
    payload = json.dumps(
        {
            "nodes": [{"id": "0", "label": "Person", "properties": {}}],
            "relationships": [],
        }
    )
    rows = extract_graph_rows(
        make_chunks(spark, ["some text"]), static_extractor(payload)
    )
    nodes, edges = split_graph_rows(rows.cache())
    n = nodes.collect()
    assert len(n) == 1
    assert n[0]["id"] == "uid0:0"
    assert n[0]["label"] == "Person"
    assert n[0]["properties"] == {"chunk_index": "0"}
    assert n[0]["is_entity"] is True
    e = edges.collect()
    assert len(e) == 1
    assert e[0]["type"] == "FROM_CHUNK"
    assert e[0]["start_node_id"] == "uid0:0"
    assert e[0]["end_node_id"] == "uid0"


def test_extract_ignore_mode_bad_json(spark) -> None:
    rows = extract_graph_rows(
        make_chunks(spark, ["text"]),
        static_extractor('{"nodes": [], "relationships": }'),
        on_error="IGNORE",
    ).cache()
    nodes, edges = split_graph_rows(rows)
    assert nodes.count() == 0 and edges.count() == 0
    status = rows.where(F.col("kind") == "status").collect()
    assert len(status) == 1 and status[0]["status"].startswith("error:")


def test_extract_raise_mode_bad_json(spark) -> None:
    from py4j.protocol import Py4JJavaError

    rows = extract_graph_rows(
        make_chunks(spark, ["text"]),
        static_extractor('{"nodes": [], "relationships": }'),
        on_error="RAISE",
    )
    with pytest.raises(Exception):
        rows.count()


def test_extract_fixable_json_gets_fixed(spark) -> None:
    raw = '{"nodes": [{"id": "0", "label": "Person", "properties": {}}], "relationships": [}'
    rows = extract_graph_rows(
        make_chunks(spark, ["text"]), static_extractor(raw), on_error="IGNORE"
    )
    nodes, edges = split_graph_rows(rows.cache())
    assert nodes.count() == 1
    assert edges.count() == 1  # FROM_CHUNK only


def test_parse_extraction_contract() -> None:
    with pytest.raises(ExtractionError):
        parse_extraction('{"nodes": [{"label": "Person"}], "relationships": []}')
    with pytest.raises(ExtractionError):
        parse_extraction(
            '[{"nodes": [], "relationships": []}]'
        )  # list not dict
    ok = parse_extraction('{"nodes": [], "relationships": []}')
    assert ok == {"nodes": [], "relationships": []}


def test_regex_extractor_triples(spark) -> None:
    text = (
        "Alice works for Acme Corp. Acme Corp is located in Paris. "
        "Alice knows Bob."
    )
    [raw] = regex_extractor(demo_rules())([text])
    graph = json.loads(raw)
    names = {(n["label"], n["properties"]["name"]) for n in graph["nodes"]}
    assert names == {
        ("Person", "Alice"),
        ("Organization", "Acme Corp"),
        ("Location", "Paris"),
        ("Person", "Bob"),
    }
    by_type = {}
    id_to_name = {n["id"]: n["properties"]["name"] for n in graph["nodes"]}
    for r in graph["relationships"]:
        by_type.setdefault(r["type"], []).append(
            (id_to_name[r["start_node_id"]], id_to_name[r["end_node_id"]])
        )
    assert by_type == {
        "WORKS_FOR": [("Alice", "Acme Corp")],
        "LOCATED_IN": [("Acme Corp", "Paris")],
        "KNOWS": [("Alice", "Bob")],
    }
