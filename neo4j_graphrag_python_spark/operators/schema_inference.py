"""Schema inference: from an LLM (reference parity) or from data (Spark-native).

* :func:`extract_schema_from_text` — reference SchemaFromTextExtractor
  (experimental/components/schema.py:411-493): prompt an LLM with sample
  text, parse its JSON (dict, or first-of-list; empty list → empty
  schema), build a GraphSchema.  Driver-side, single call on a text
  sample; the LLM slot is a plain ``Callable[[str], str]``.

* :func:`describe_graph` — the DB-introspection analog
  (reference root schema.py:134-913 get_structured_schema /
  enhance_schema): label/type counts, property-key frequencies and sample
  values computed from the materialized node/edge tables with plain
  aggregations (explode of map_keys; approx_count_distinct).
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql import DataFrame, functions as F

from neo4j_graphrag_python_spark.functions.prompts import PromptTemplate
from neo4j_graphrag_python_spark.schema import GraphSchema


class SchemaExtractionError(ValueError):
    pass


SCHEMA_EXTRACTION_TEMPLATE = PromptTemplate(
    template=(
        "You are a top-tier algorithm designed for extracting a labeled "
        "property graph schema in structured formats.\n\n"
        "Analyze the following text and extract only the types present:\n"
        '{{"node_types": [{{"label": "Person", "properties": '
        '[{{"name": "name", "type": "STRING"}}]}}],\n'
        '"relationship_types": [{{"label": "KNOWS"}}],\n'
        '"patterns": [["Person", "KNOWS", "Person"]]}}\n\n'
        "Return only JSON.\n\nExamples:\n{examples}\n\nText:\n{text}"
    ),
    expected_inputs=["text"],
)


def extract_schema_from_text(
    text: str,
    llm_fn: Callable[[str], str],
    examples: str = "",
    prompt_template: PromptTemplate | None = None,
) -> GraphSchema:
    """Infer a GraphSchema from sample text via an LLM.

    Parsing rules mirror the reference exactly (schema.py:450-493):
    dict kept; non-empty list of dicts → first element; empty list →
    empty schema; anything else / invalid JSON → SchemaExtractionError.
    """
    template = prompt_template or SCHEMA_EXTRACTION_TEMPLATE
    prompt = template.format(text=text, examples=examples)
    content = llm_fn(prompt)
    try:
        extracted: Any = json.loads(content)
    except json.JSONDecodeError as exc:
        raise SchemaExtractionError("LLM response is not valid JSON.") from exc
    if isinstance(extracted, dict):
        pass
    elif isinstance(extracted, list):
        if extracted and isinstance(extracted[0], dict):
            extracted = extracted[0]
        elif not extracted:
            extracted = {}
        else:
            raise SchemaExtractionError(
                "Expected a dictionary or list of dictionaries, but got list "
                f"containing: {type(extracted[0])}"
            )
    else:
        raise SchemaExtractionError(
            f"Unexpected schema format returned from LLM: {type(extracted)}."
        )
    return GraphSchema.from_dict(
        {
            "node_types": extracted.get("node_types") or [],
            "relationship_types": extracted.get("relationship_types") or (),
            "patterns": extracted.get("patterns") or (),
        }
    )


def describe_graph(
    nodes: DataFrame,
    edges: DataFrame,
    sample_values: int = 3,
) -> dict[str, DataFrame]:
    """Structured introspection of a materialized graph.

    Returns DataFrames:
      * ``labels``: label, n_nodes, n_distinct_names
      * ``node_properties``: label, property, n, n_distinct (approx),
        sample_values (array)
      * ``relationship_types``: type, n_edges
      * ``patterns``: (start_label, type, end_label), n — the observed
        pattern inventory (what GraphSchema.patterns would declare)
    """
    labels = nodes.groupBy("label").agg(
        F.count("*").alias("n_nodes"),
        F.approx_count_distinct(
            F.col("properties").getItem("name")
        ).alias("n_distinct_names"),
    )
    node_props = (
        nodes.select("label", F.explode(F.col("properties")).alias("property", "value"))
        .groupBy("label", "property")
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("value").alias("n_distinct"),
            F.slice(F.collect_set("value"), 1, sample_values).alias(
                "sample_values"
            ),
        )
    )
    rel_types = edges.groupBy("type").agg(F.count("*").alias("n_edges"))
    nl = nodes.select(F.col("id").alias("_nid"), F.col("label"))
    patterns = (
        edges.join(
            nl.select(F.col("_nid").alias("_s"), F.col("label").alias("start_label")),
            F.col("start_node_id") == F.col("_s"),
        )
        .join(
            nl.select(F.col("_nid").alias("_e"), F.col("label").alias("end_label")),
            F.col("end_node_id") == F.col("_e"),
        )
        .groupBy("start_label", "type", "end_label")
        .agg(F.count("*").alias("n"))
    )
    return {
        "labels": labels,
        "node_properties": node_props,
        "relationship_types": rel_types,
        "patterns": patterns,
    }
