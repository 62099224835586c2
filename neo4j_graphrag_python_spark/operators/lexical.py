"""Stage 3 — lexical graph: Document/Chunk nodes + structural edges.

Reference: components/lexical_graph.py:38-197 —
  * one Document node per document (path + metadata properties, :105-118);
  * one Chunk node per chunk (text + index properties, :120-144);
  * FROM_DOCUMENT chunk→document (:146-156);
  * NEXT_CHUNK chunk i → chunk i+1 (:158-168, zip_longest pairing).

Spark-first: all projections; NEXT_CHUNK is ``lead() over
(partition by conv_id order by chunk_index)`` — no join, one window pass
(SURVEY.md §2.4 J5).  The reference stamps Document nodes with
``datetime.now`` (:115); we use the conversation's min(ts) so output is
deterministic and resume-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from neo4j_graphrag_python_spark.types import (
    EDGES_SCHEMA,
    NODES_SCHEMA,
    LexicalGraphConfig,
)


def _empty_props():
    return F.create_map().cast("map<string,string>")


def build_document_nodes(
    documents: DataFrame, config: LexicalGraphConfig
) -> DataFrame:
    return documents.select(
        F.col("conv_id").alias("id"),
        F.lit(config.document_node_label).alias("label"),
        F.lit(False).alias("is_entity"),
        F.map_from_arrays(
            F.array(F.lit("path"), F.lit("n_turns")),
            F.array(F.col("conv_id"), F.col("n_turns").cast("string")),
        ).alias("properties"),
        F.lit(None).cast("array<float>").alias("embedding"),
        F.col("conv_id"),
        F.lit(None).cast("string").alias("chunk_uid"),
    )


def build_chunk_nodes(chunks: DataFrame, config: LexicalGraphConfig) -> DataFrame:
    return chunks.select(
        F.col("chunk_uid").alias("id"),
        F.lit(config.chunk_node_label).alias("label"),
        F.lit(False).alias("is_entity"),
        F.map_from_arrays(
            F.array(
                F.lit(config.chunk_text_property),
                F.lit(config.chunk_index_property),
                F.lit("char_start"),
                F.lit("char_end"),
            ),
            F.array(
                F.col("text"),
                F.col("chunk_index").cast("string"),
                F.col("char_start").cast("string"),
                F.col("char_end").cast("string"),
            ),
        ).alias("properties"),
        (
            F.col("embedding").cast("array<float>")
            if "embedding" in chunks.columns
            else F.lit(None).cast("array<float>")
        ).alias("embedding"),
        F.col("conv_id"),
        F.col("chunk_uid"),
    )


def build_from_document_edges(
    chunks: DataFrame, config: LexicalGraphConfig
) -> DataFrame:
    return chunks.select(
        F.col("chunk_uid").alias("start_node_id"),
        F.col("conv_id").alias("end_node_id"),
        F.lit(config.chunk_to_document_relationship_type).alias("type"),
        _empty_props().alias("properties"),
        F.lit(config.chunk_node_label).alias("start_label"),
        F.lit(config.document_node_label).alias("end_label"),
        F.col("conv_id"),
        F.col("chunk_uid"),
    )


def build_next_chunk_edges(
    chunks: DataFrame, config: LexicalGraphConfig
) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("chunk_index")
    return (
        chunks.select(
            "conv_id",
            "chunk_uid",
            "chunk_index",
            F.lead("chunk_uid").over(w).alias("next_uid"),
        )
        .where(F.col("next_uid").isNotNull())
        .select(
            F.col("chunk_uid").alias("start_node_id"),
            F.col("next_uid").alias("end_node_id"),
            F.lit(config.next_chunk_relationship_type).alias("type"),
            _empty_props().alias("properties"),
            F.lit(config.chunk_node_label).alias("start_label"),
            F.lit(config.chunk_node_label).alias("end_label"),
            F.col("conv_id"),
            F.col("chunk_uid"),
        )
    )


def build_lexical_graph(
    documents: DataFrame,
    chunks: DataFrame,
    config: LexicalGraphConfig | None = None,
    include_document_nodes: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """→ (nodes, edges) with the canonical NODES_SCHEMA / EDGES_SCHEMA."""
    config = config or LexicalGraphConfig()
    chunk_nodes = build_chunk_nodes(chunks, config)
    if include_document_nodes:
        nodes = build_document_nodes(documents, config).unionByName(chunk_nodes)
        edges = build_from_document_edges(chunks, config).unionByName(
            build_next_chunk_edges(chunks, config)
        )
    else:
        nodes = chunk_nodes
        edges = build_next_chunk_edges(chunks, config)
    spark_nodes_cols = [f.name for f in NODES_SCHEMA.fields]
    # edges keep start_label/end_label (consumed and dropped by pruning)
    spark_edges_cols = [f.name for f in EDGES_SCHEMA.fields] + [
        "start_label",
        "end_label",
    ]
    return nodes.select(*spark_nodes_cols), edges.select(
        *[c for c in spark_edges_cols if c in edges.columns]
    )
