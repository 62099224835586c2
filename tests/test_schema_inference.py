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


def test_get_structured_schema_types_and_samples(spark) -> None:
    """Mirrors reference tests for get_structured_schema/enhance_schema
    (root schema.py:228-351, 853-913): inferred property types, exact
    distinct counts, bounded value samples, numeric min/max — recovered
    from the MAP<STRING,STRING> property bags by try_cast votes."""
    from neo4j_graphrag_python_spark.operators.schema_inference import (
        get_structured_schema,
    )

    rows = []
    for i in range(12):
        rows.append(
            (
                f"p{i}",
                "Person",
                True,
                {
                    "name": f"Name{i:02d}",
                    "age": str(20 + i),
                    "score": f"{i}.5",
                    "active": "true" if i % 2 else "false",
                    "joined": f"2024-01-{i + 1:02d}",
                },
                None,
                "c",
                "u",
            )
        )
    rows.append(("o1", "Organization", True, {"name": "Acme"}, None, "c", "u"))
    nodes = spark.createDataFrame(rows, NODES_SCHEMA)
    edges = spark.createDataFrame(
        [("p1", "o1", "WORKS_FOR", {"since": "2020"}, "c", "u")], EDGES_SCHEMA
    )
    s = get_structured_schema(nodes, edges)
    person = {p["property"]: p for p in s["node_props"]["Person"]}
    assert person["age"]["type"] == "INTEGER"
    assert person["age"]["min"] == 20 and person["age"]["max"] == 31
    assert person["score"]["type"] == "FLOAT"
    assert person["score"]["min"] == 0.5 and person["score"]["max"] == 11.5
    assert person["active"]["type"] == "BOOLEAN"
    assert person["joined"]["type"] == "DATE"
    assert person["joined"]["min"] == "2024-01-01"
    assert person["name"]["type"] == "STRING"
    # 12 distinct names > DISTINCT_VALUE_LIMIT → sample bounded at limit
    assert person["name"]["distinct_count"] == 12
    assert len(person["name"]["values"]) == 10
    org = {p["property"]: p for p in s["node_props"]["Organization"]}
    assert org["name"]["values"] == ["Acme"] and org["name"]["distinct_count"] == 1
    since = {p["property"]: p for p in s["rel_props"]["WORKS_FOR"]}
    assert since["since"]["type"] == "INTEGER"
    assert s["relationships"] == [
        {"start": "Person", "type": "WORKS_FOR", "end": "Organization"}
    ]
    assert s["metadata"] == {"constraint": [], "index": []}


def test_date_range_is_chronological_not_lexicographic(spark) -> None:
    """try_cast('date') accepts non-zero-padded forms like '2024-2-1',
    which sort wrongly as strings ('2024-10-1' < '2024-2-1'); the DATE
    Min/Max must come from a typed aggregation (ADVICE r3)."""
    from neo4j_graphrag_python_spark.operators.schema_inference import (
        get_structured_schema,
    )

    nodes = spark.createDataFrame(
        [
            ("p1", "Person", True, {"d": "2024-2-1"}, None, "c", "u"),
            ("p2", "Person", True, {"d": "2024-10-1"}, None, "c", "u"),
        ],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame([], EDGES_SCHEMA)
    d = {p["property"]: p for p in
         get_structured_schema(nodes, edges)["node_props"]["Person"]}
    assert d["d"]["type"] == "DATE"
    # lexicographic string min/max would report min=2024-10-1, max=2024-2-1
    assert d["d"]["min"] == "2024-02-01" and d["d"]["max"] == "2024-10-01"


def test_structured_schema_is_one_driver_job(spark, monkeypatch) -> None:
    """Node stats, rel stats and patterns ride ONE union → one collect
    (VERDICT r3 #6: three separate driver-blocking jobs halve to one —
    latency a Text2SQL user pays per retriever construction)."""
    from neo4j_graphrag_python_spark.operators.schema_inference import (
        get_structured_schema,
    )

    nodes = spark.createDataFrame(
        [("p1", "Person", True, {"name": "A"}, None, "c", "u"),
         ("o1", "Org", True, {"name": "B"}, None, "c", "u")],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame(
        [("p1", "o1", "WORKS_FOR", {"since": "2020"}, "c", "u")], EDGES_SCHEMA
    )
    calls = []
    cls = type(nodes)  # Spark 4's classic DataFrame overrides collect
    real_collect = cls.collect
    monkeypatch.setattr(
        cls, "collect", lambda self: (calls.append(1), real_collect(self))[1]
    )
    s = get_structured_schema(nodes, edges)
    assert len(calls) == 1
    assert s["relationships"] == [
        {"start": "Person", "type": "WORKS_FOR", "end": "Org"}
    ]
    assert {p["property"] for p in s["node_props"]["Person"]} == {"name"}
    assert s["rel_props"]["WORKS_FOR"][0]["type"] == "INTEGER"


def test_format_schema_enhanced_and_compact(spark) -> None:
    from neo4j_graphrag_python_spark.operators.schema_inference import (
        format_schema,
    )

    schema = {
        "node_props": {
            "Person": [
                {
                    "property": "age",
                    "type": "INTEGER",
                    "values": ["20", "21"],
                    "distinct_count": 2,
                    "min": 20,
                    "max": 21,
                },
                {
                    "property": "bio",
                    "type": "STRING",
                    "values": ["long text …"],
                    "distinct_count": 11,
                },
            ]
        },
        "rel_props": {},
        "relationships": [{"start": "Person", "type": "KNOWS", "end": "Person"}],
    }
    enhanced = format_schema(schema, is_enhanced=True)
    assert "- `age`: INTEGER Min: 20, Max: 21" in enhanced
    assert '- `bio`: STRING Example: "long text …"' in enhanced
    compact = format_schema(schema, is_enhanced=False)
    assert "Person {age: INTEGER, bio: STRING}" in compact
    assert "(:Person)-[:KNOWS]->(:Person)" in compact


def test_format_property_honest_about_truncated_samples() -> None:
    """A sample smaller than distinct_count must render as ONE example,
    never as an exhaustive 'Available options' list (review finding:
    the old check compared against the module default limit, so a
    custom distinct_value_limit presented partial lists as complete).
    Examples are newline-stripped and length-capped."""
    from neo4j_graphrag_python_spark.operators.schema_inference import (
        _format_property,
    )

    truncated = {
        "property": "city",
        "type": "STRING",
        "values": ["a", "b", "c"],
        "distinct_count": 8,
    }
    assert _format_property(truncated) == 'Example: "a"'
    exhaustive = {**truncated, "distinct_count": 3}
    assert _format_property(exhaustive) == "Available options: ['a', 'b', 'c']"
    long_val = {
        "property": "bio",
        "type": "STRING",
        "values": ["line1\nline2 " + "x" * 100],
        "distinct_count": 99,
    }
    rendered = _format_property(long_val)
    assert "\n" not in rendered and len(rendered) < 80


def test_structured_schema_int64_range_exact(spark) -> None:
    """INTEGER min/max must be exact above 2^53 (double round-trip is
    lossy there)."""
    from neo4j_graphrag_python_spark.operators.schema_inference import (
        get_structured_schema,
    )

    big = 9007199254740993  # 2^53 + 1
    nodes = spark.createDataFrame(
        [
            ("a", "Thing", True, {"val": str(big)}, None, "c", "u"),
            ("b", "Thing", True, {"val": "7"}, None, "c", "u"),
        ],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame([], EDGES_SCHEMA)
    s = get_structured_schema(nodes, edges)
    val = {p["property"]: p for p in s["node_props"]["Thing"]}["val"]
    assert val["type"] == "INTEGER"
    assert val["min"] == 7 and val["max"] == big  # not 2^53


def test_typed_stats_truncate_long_values(spark) -> None:
    """Long free-text property values are truncated before the distinct
    sample shuffle, so chunk-sized texts never land verbatim in the
    schema (prompt bloat / content injection)."""
    from neo4j_graphrag_python_spark.operators.schema_inference import (
        typed_property_stats,
    )

    nodes = spark.createDataFrame(
        [("a", "Chunk", False, {"text": "y" * 600}, None, "c", "u")],
        NODES_SCHEMA,
    )
    row = [
        r
        for r in typed_property_stats(nodes).collect()
        if r["property"] == "text"
    ][0]
    assert all(len(v) <= 80 for v in row["values"])


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
