"""Schema-from-text parsing rules + graph introspection."""

from __future__ import annotations

import json

import pytest

from neo4j_graphrag_python_spark.operators.schema_inference import (
    SchemaExtractionError,
    describe_graph,
    extract_schema_from_text,
)
from neo4j_graphrag_python_spark.types import EDGES_SCHEMA, NODES_SCHEMA

SCHEMA_JSON = {
    "node_types": [
        {"label": "Person", "properties": [{"name": "name", "type": "STRING"}]},
        {"label": "Organization"},
    ],
    "relationship_types": [{"label": "WORKS_FOR"}],
    "patterns": [["Person", "WORKS_FOR", "Organization"]],
}


def llm_returning(payload):
    return lambda prompt: payload


def test_schema_from_text_dict() -> None:
    schema = extract_schema_from_text("some text", llm_returning(json.dumps(SCHEMA_JSON)))
    assert {n.label for n in schema.node_types} == {"Person", "Organization"}
    assert schema.patterns == (("Person", "WORKS_FOR", "Organization"),)
    assert not schema.additional_node_types  # non-empty → defaults False


def test_schema_from_text_list_takes_first() -> None:
    schema = extract_schema_from_text(
        "t", llm_returning(json.dumps([SCHEMA_JSON, {"node_types": []}]))
    )
    assert {n.label for n in schema.node_types} == {"Person", "Organization"}


def test_schema_from_text_empty_list_is_empty_schema() -> None:
    schema = extract_schema_from_text("t", llm_returning("[]"))
    assert schema.node_types == () and schema.additional_node_types


@pytest.mark.parametrize("bad", ["not json", '"a string"', "[1, 2]"])
def test_schema_from_text_errors(bad: str) -> None:
    with pytest.raises(SchemaExtractionError):
        extract_schema_from_text("t", llm_returning(bad))


def test_schema_prompt_includes_text() -> None:
    seen = {}

    def llm(prompt):
        seen["prompt"] = prompt
        return "{}"

    extract_schema_from_text("UNIQUE_SAMPLE_TEXT", llm, examples="EX")
    assert "UNIQUE_SAMPLE_TEXT" in seen["prompt"] and "EX" in seen["prompt"]


def test_describe_graph(spark) -> None:
    nodes = spark.createDataFrame(
        [
            ("p1", "Person", True, {"name": "Alice", "age": "30"}, None, "c", "u"),
            ("p2", "Person", True, {"name": "Bob"}, None, "c", "u"),
            ("o1", "Organization", True, {"name": "Acme"}, None, "c", "u"),
        ],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame(
        [("p1", "o1", "WORKS_FOR", {}, "c", "u"), ("p2", "o1", "WORKS_FOR", {}, "c", "u")],
        EDGES_SCHEMA,
    )
    d = describe_graph(nodes, edges)
    labels = {r["label"]: r["n_nodes"] for r in d["labels"].collect()}
    assert labels == {"Person": 2, "Organization": 1}
    props = {
        (r["label"], r["property"]): r["n"] for r in d["node_properties"].collect()
    }
    assert props[("Person", "name")] == 2 and props[("Person", "age")] == 1
    pats = d["patterns"].collect()
    assert len(pats) == 1
    assert (pats[0]["start_label"], pats[0]["type"], pats[0]["end_label"], pats[0]["n"]) == (
        "Person", "WORKS_FOR", "Organization", 2,
    )
