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


# reference root schema.py:29 — bounds what the prompt (and the driver
# collect) can carry; LIST_LIMIT lives in functions/text.py
DISTINCT_VALUE_LIMIT = 10


def typed_property_stats(
    frame: DataFrame,
    key_col: str = "label",
    distinct_value_limit: int = DISTINCT_VALUE_LIMIT,
    value_trunc: int = 80,
) -> DataFrame:
    """Per (key, property): inferred type, exact distinct count, a bounded
    distinct-value sample and numeric min/max — the DataFrame analog of
    the reference's apoc.meta-style property introspection
    (root schema.py:57-131 NODE_PROPERTIES_QUERY / enhance_schema
    :853-913).

    Properties live in a MAP<STRING,STRING>, so types are *recovered* by
    try_cast success votes: a property is INTEGER/FLOAT/BOOLEAN/DATE only
    when EVERY non-null value casts (integers are checked before floats so
    "42" is INTEGER, "4.2" FLOAT); anything else is STRING.

    Scale shape: one explode → one aggregation for the type votes and
    ranges; the value sample comes from a DISTINCT on (key, property,
    value) followed by a per-group row_number truncation — the dedupe
    happens *before* any collect_list, so no unbounded per-group state is
    ever built (collect_set over a high-cardinality property would
    materialize every distinct value per group).  The window and the
    final groupBy share one hash partitioning on (key, property).

    Sampled values are truncated to ``value_trunc`` chars BEFORE the
    distinct, so long free-text properties (chunk texts) never ride the
    sample shuffle or land verbatim in a prompt; ``distinct_count`` is
    therefore counted over the truncated values — a lower bound on the
    true cardinality, which only ever demotes a rendered "available
    options" list to a single example, never the reverse.  Type votes and
    min/max always use the full values.
    """
    from pyspark.sql import Window

    kv = frame.select(
        F.col(key_col).alias("key"),
        F.explode(F.col("properties")).alias("property", "value"),
    )
    v = F.col("value")
    is_long = v.try_cast("bigint").isNotNull()
    is_double = v.try_cast("double").isNotNull()
    is_bool = F.lower(v).isin("true", "false")
    is_date = v.try_cast("date").isNotNull() & ~is_double
    stats = kv.groupBy("key", "property").agg(
        F.count("*").alias("n"),
        F.count(v).alias("n_nonnull"),
        F.count(F.when(is_long, 1)).alias("n_long"),
        F.count(F.when(is_double, 1)).alias("n_double"),
        F.count(F.when(is_bool, 1)).alias("n_bool"),
        F.count(F.when(is_date, 1)).alias("n_date"),
        F.min(v.try_cast("double")).alias("min_num"),
        F.max(v.try_cast("double")).alias("max_num"),
        # exact 64-bit range for INTEGER properties: a double round-trip
        # is lossy above 2^53
        F.min(v.try_cast("bigint")).alias("min_long"),
        F.max(v.try_cast("bigint")).alias("max_long"),
        # typed DATE range — lexicographic string min/max is wrong for
        # non-zero-padded forms try_cast accepts ('2024-10-1' < '2024-2-1'
        # as strings).  Gated on the DATE vote ("31706" try_casts to
        # year-31706) and cast back to string JVM-side: Python's date
        # cannot deserialize years > 9999 at collect time
        F.min(F.when(is_date, v.try_cast("date"))).cast("string").alias("min_date"),
        F.max(F.when(is_date, v.try_cast("date"))).cast("string").alias("max_date"),
        F.min(v).alias("min_str"),
        F.max(v).alias("max_str"),
    )
    nn = F.col("n_nonnull")
    inferred = (
        F.when(nn == 0, F.lit("STRING"))
        .when(F.col("n_bool") == nn, F.lit("BOOLEAN"))
        .when(F.col("n_long") == nn, F.lit("INTEGER"))
        .when(F.col("n_double") == nn, F.lit("FLOAT"))
        .when(F.col("n_date") == nn, F.lit("DATE"))
        .otherwise(F.lit("STRING"))
    )
    stats = stats.withColumn("type", inferred)

    w = Window.partitionBy("key", "property")
    distinct_vals = (
        kv.where(v.isNotNull())
        .select("key", "property", F.substring(v, 1, value_trunc).alias("value"))
        .distinct()
        .withColumn("rn", F.row_number().over(w.orderBy("value")))
        .withColumn("distinct_count", F.count("*").over(w))
    )
    samples = (
        distinct_vals.where(F.col("rn") <= distinct_value_limit)
        .groupBy("key", "property")
        .agg(
            F.sort_array(F.collect_list("value")).alias("values"),
            F.first("distinct_count").alias("distinct_count"),
        )
    )
    return stats.join(samples, ["key", "property"], "left").select(
        "key",
        "property",
        "type",
        F.coalesce("distinct_count", F.lit(0)).alias("distinct_count"),
        F.coalesce("values", F.array().cast("array<string>")).alias("values"),
        "min_num",
        "max_num",
        "min_long",
        "max_long",
        "min_date",
        "max_date",
        "min_str",
        "max_str",
        "n",
        "n_nonnull",
    )


def get_structured_schema(
    nodes: DataFrame,
    edges: DataFrame,
    distinct_value_limit: int = DISTINCT_VALUE_LIMIT,
) -> dict[str, Any]:
    """Driver-side structured schema in the reference's
    ``get_structured_schema`` shape (root schema.py:228-351):

    .. code:: python

        {"node_props": {"Person": [{"property": "name", "type": "STRING",
                                    "values": [...], "distinct_count": 7,
                                    "min": ..., "max": ...}, ...]},
         "rel_props": {"KNOWS": [...]},
         "relationships": [{"start": "Person", "type": "KNOWS",
                            "end": "Person"}],
         "metadata": {"constraint": [], "index": []}}

    ``metadata`` is empty by design: a DataFrame graph has no Neo4j
    constraints/indexes to report.  The collect is bounded by
    (labels × properties × distinct_value_limit) — schema-sized, not
    data-sized.
    """

    def to_props(rows) -> dict[str, list[dict[str, Any]]]:
        out: dict[str, list[dict[str, Any]]] = {}
        for r in rows:
            prop: dict[str, Any] = {
                "property": r["property"],
                "type": r["type"],
                "values": list(r["values"] or []),
                "distinct_count": int(r["distinct_count"]),
            }
            if r["type"] == "INTEGER" and r["min_long"] is not None:
                # exact bigint range, not a double round-trip
                prop["min"] = int(r["min_long"])
                prop["max"] = int(r["max_long"])
            elif r["type"] == "FLOAT" and r["min_num"] is not None:
                prop["min"] = r["min_num"]
                prop["max"] = r["max_num"]
            elif r["type"] == "DATE" and r["min_date"] is not None:
                # typed date range rendered as ISO strings (string min/max
                # is lexicographic and wrong for non-zero-padded dates)
                prop["min"] = str(r["min_date"])
                prop["max"] = str(r["max_date"])
            out.setdefault(r["key"], []).append(prop)
        for props in out.values():
            props.sort(key=lambda p: p["property"])
        return out

    # ONE driver-blocking job for the whole introspection: node property
    # stats, relationship property stats and the observed pattern
    # inventory are tagged by kind, unioned, and collected together — a
    # Text2SQL user pays this latency per retriever construction, and the
    # three sub-plans have no dependency forcing separate actions
    node_stats = typed_property_stats(
        nodes, "label", distinct_value_limit
    ).withColumn("kind", F.lit("node"))
    rel_stats = typed_property_stats(
        edges, "type", distinct_value_limit
    ).withColumn("kind", F.lit("rel"))
    patterns = (
        describe_graph(nodes, edges)["patterns"]
        .select(
            F.lit("pattern").alias("kind"),
            F.col("start_label").alias("pat_start"),
            F.col("type").alias("pat_type"),
            F.col("end_label").alias("pat_end"),
        )
    )
    rows = (
        node_stats.unionByName(rel_stats)
        .unionByName(patterns, allowMissingColumns=True)
        .collect()
    )
    rels = sorted(
        (
            {"start": r["pat_start"], "type": r["pat_type"], "end": r["pat_end"]}
            for r in rows
            if r["kind"] == "pattern"
        ),
        key=lambda d: (d["start"], d["type"], d["end"]),
    )
    return {
        "node_props": to_props([r for r in rows if r["kind"] == "node"]),
        "rel_props": to_props([r for r in rows if r["kind"] == "rel"]),
        "relationships": rels,
        "metadata": {"constraint": [], "index": []},
    }


def _format_property(prop: dict[str, Any]) -> str | None:
    """Reference _format_property (root schema.py:370-400): an example for
    high-cardinality strings, the full option list for low-cardinality
    ones, min/max for numerics and dates.

    "Available options" is claimed ONLY when the sample is actually
    exhaustive (``distinct_count <= len(values)``), not against the
    module's default limit — a caller-set ``distinct_value_limit`` (or
    sample truncation) must demote to a single example rather than
    present a partial list as complete.  Rendered examples are
    newline-stripped (reference _clean_string_values) and length-capped.
    """
    from neo4j_graphrag_python_spark.functions.text import clean_string_values

    def ex(val: str) -> str:
        return clean_string_values(str(val))[:60]

    if prop["type"] == "STRING" and prop.get("values"):
        values = list(prop["values"])
        if prop.get("distinct_count", len(values) + 1) > len(values):
            return f'Example: "{ex(values[0])}"'
        return f"Available options: {[ex(v) for v in values]}"
    if prop["type"] in ("INTEGER", "FLOAT", "DATE"):
        if prop.get("min") is not None and prop.get("max") is not None:
            return f"Min: {prop['min']}, Max: {prop['max']}"
        return f'Example: "{ex(prop["values"][0])}"' if prop.get("values") else ""
    return ""


def format_schema(schema: dict[str, Any], is_enhanced: bool = False) -> str:
    """Reference format_schema (root schema.py:458-497): compact
    ``Label {prop: TYPE, ...}`` lines, or the enhanced markdown form with
    per-property examples/ranges when ``is_enhanced``.

    Intentional byte-level divergence from the reference: its
    _format_properties always joins '`prop`: TYPE' and the example with a
    single space, leaving a trailing space when the example is empty;
    here the separator is suppressed for empty examples, so lines never
    carry trailing whitespace.  Consumers diffing against reference
    get_schema output should normalize trailing spaces first.
    """
    lines: list[str] = []

    def fmt_props(prop_dict: dict[str, Any]) -> list[str]:
        out = []
        if is_enhanced:
            for label, props in prop_dict.items():
                out.append(f"- **{label}**")
                for p in props:
                    example = _format_property(p)
                    if example is not None:
                        suffix = f" {example}" if example else ""
                        out.append(f"  - `{p['property']}`: {p['type']}{suffix}")
        else:
            for label, props in prop_dict.items():
                inner = ", ".join(f"{p['property']}: {p['type']}" for p in props)
                out.append(f"{label} {{{inner}}}")
        return out

    lines.append("Node properties:")
    lines.extend(fmt_props(schema["node_props"]))
    lines.append("Relationship properties:")
    lines.extend(fmt_props(schema["rel_props"]))
    lines.append("The relationships:")
    lines.extend(
        f"(:{el['start']})-[:{el['type']}]->(:{el['end']})"
        for el in schema["relationships"]
    )
    return "\n".join(lines)


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
    from pyspark.sql import Window

    kv = nodes.select(
        "label", F.explode(F.col("properties")).alias("property", "value")
    )
    stats = kv.groupBy("label", "property").agg(
        F.count("*").alias("n"),
        F.approx_count_distinct("value").alias("n_distinct"),
    )
    # bounded sample: distinct BEFORE any collect — slice(collect_set(...))
    # still materializes every distinct value per group in the aggregation
    # buffer, which is unbounded state for high-cardinality properties
    w = Window.partitionBy("label", "property").orderBy("value")
    sampled = (
        kv.where(F.col("value").isNotNull())
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= sample_values)
        .groupBy("label", "property")
        # sort_array: collect_list order depends on partitioning/run —
        # sorted output matches typed_property_stats and keeps this frame
        # snapshot-testable
        .agg(F.sort_array(F.collect_list("value")).alias("sample_values"))
    )
    node_props = stats.join(sampled, ["label", "property"], "left").withColumn(
        "sample_values",
        F.coalesce("sample_values", F.array().cast("array<string>")),
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
