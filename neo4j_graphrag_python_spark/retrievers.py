"""Query-side retrieval over the materialized graph (reference v2 scope).

Spark equivalents of the reference retrievers (SURVEY.md §2.8):

  * VectorRetriever (retrievers/vector.py:145-223): embed query → cosine
    over node embeddings → top-k; optional metadata filters compiled by
    functions/filters.py (pushdown-capable, replacing the reference's
    filtered exact-KNN path neo4j_queries.py:214-252);
  * HybridRetriever (retrievers/hybrid.py): vector ∪ fulltext with
    per-source max-normalization and naive/linear fusion
    (neo4j_queries.py:148-211) — fusion math in operators/similarity.py;
  * fulltext search: tokenized term match scored by hit count (a
    DataFrame stand-in for the Lucene index the reference creates with
    db.index.fulltext; at scale, back this with an inverted table).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, functions as F

from neo4j_graphrag_python_spark.functions.embedding import DEFAULT_DIM, embed_text
from neo4j_graphrag_python_spark.functions.filters import filter_to_column
from neo4j_graphrag_python_spark.operators.similarity import (
    cosine_col,
    hybrid_fusion,
)


def vector_search(
    nodes: DataFrame,
    query_text: str | None = None,
    query_vector: Sequence[float] | None = None,
    top_k: int = 5,
    filters: dict[str, Any] | None = None,
    embedding_col: str = "embedding",
) -> DataFrame:
    """→ (id, score) top-k by cosine; optional property-bag filters."""
    if query_vector is None:
        if query_text is None:
            raise ValueError("provide query_text or query_vector")
        query_vector = embed_text(query_text, DEFAULT_DIM).tolist()
    base = nodes.where(F.col(embedding_col).isNotNull())
    if filters:
        base = base.where(
            filter_to_column(
                filters, lambda f: F.col("properties").getItem(f)
            )
        )
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    scored = base.select(
        "id",
        cosine_col(F.col(embedding_col).cast("array<double>"), q).alias("score"),
    )
    return scored.orderBy(F.desc("score"), "id").limit(top_k)


def fulltext_search(
    nodes: DataFrame,
    query_text: str,
    text_property: str = "name",
    top_k: int = 5,
) -> DataFrame:
    """Term-hit scoring over a property: score = #query terms contained
    (lowercased).  → (id, score)."""
    terms = [t for t in query_text.lower().split() if t]
    if not terms:
        raise ValueError("empty query")
    prop = F.lower(F.coalesce(F.col("properties").getItem(text_property), F.lit("")))
    score = sum(
        (F.when(prop.contains(t), F.lit(1.0)).otherwise(F.lit(0.0)) for t in terms),
        F.lit(0.0),
    )
    return (
        nodes.select("id", score.alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), "id")
        .limit(top_k)
    )


def build_fulltext_index(
    nodes: DataFrame, text_property: str = "name"
) -> DataFrame:
    """Inverted postings table (term, id, tf) — the Spark analog of
    create_fulltext_index (reference indexes.py:126): tokenize the property
    (lowercase, whitespace analysis), explode to one row per (doc, term),
    aggregate term frequency.

    At scale, persist with :func:`write_fulltext_index_bucketed` so a
    search scans only the buckets holding its query terms (bucket
    pruning) — the scan-based :func:`fulltext_search` reads every node
    row per query, which is the wrong shape past small data.
    """
    prop = F.lower(
        F.coalesce(F.col("properties").getItem(text_property), F.lit(""))
    )
    return (
        nodes.select(
            "id", F.explode(F.split(F.trim(prop), r"\s+")).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy("term", "id")
        .agg(F.count("*").alias("tf"))
    )


def fulltext_search_indexed(
    index: DataFrame, query_text: str, top_k: int = 5
) -> DataFrame:
    """Token-match search against a :func:`build_fulltext_index` table:
    score = #distinct query terms present (the same counting rule as the
    scan path for whole-token matches).  → (id, score).

    Plan shape: broadcast the (tiny) query-term set, equi-join on term —
    with a bucketed index this touches only the matching term buckets,
    never the corpus."""
    terms = sorted({t for t in query_text.lower().split() if t})
    if not terms:
        raise ValueError("empty query")
    spark = index.sparkSession
    q = spark.createDataFrame([(t,) for t in terms], ["term"])
    return (
        index.join(F.broadcast(q), "term")
        .groupBy("id")
        .agg(F.count_distinct("term").cast("double").alias("score"))
        .orderBy(F.desc("score"), "id")
        .limit(top_k)
    )


def write_fulltext_index_bucketed(
    index: DataFrame, table_name: str, num_buckets: int = 64
) -> None:
    """Persist a :func:`build_fulltext_index` postings table bucketed and
    sorted by term — the durable form of the reference's Lucene fulltext
    index (indexes.py:126 create_fulltext_index).

    Bucketing by term means a query's ``term IN (...)`` predicate prunes
    to the handful of buckets that can contain those terms
    (``SelectedBucketsCount: k out of num_buckets`` in the scan node —
    asserted in tests), and the within-bucket sort makes the term lookup
    a sorted-run scan.  ``bucketBy`` requires a managed table
    (``saveAsTable``); size num_buckets so one bucket ≈ one task's worth
    of postings at the target corpus.
    """
    (
        index.write.mode("overwrite")
        .bucketBy(num_buckets, "term")
        .sortBy("term")
        .format("parquet")
        .saveAsTable(table_name)
    )


def fulltext_search_bucketed(
    spark, table_name: str, query_text: str, top_k: int = 5
) -> DataFrame:
    """Search a bucketed postings table: the query terms become an IN
    filter (reaches the scan → bucket pruning), then the same
    distinct-term-count scoring as :func:`fulltext_search_indexed`."""
    terms = sorted({t for t in query_text.lower().split() if t})
    if not terms:
        raise ValueError("empty query")
    postings = spark.table(table_name).where(F.col("term").isin(terms))
    return (
        postings.groupBy("id")
        .agg(F.count_distinct("term").cast("double").alias("score"))
        .orderBy(F.desc("score"), "id")
        .limit(top_k)
    )


def expand_neighborhood(
    edges: DataFrame,
    start_ids: DataFrame,
    hops: int = 1,
    rel_types: list[str] | None = None,
    direction: str = "both",
) -> DataFrame:
    """k-hop neighborhood expansion — the join-based traversal tail of
    VectorCypherRetriever (reference retrievers/vector.py:226-392: vector
    search result piped into a Cypher pattern).

    ``start_ids``: DataFrame with column ``id``.  Returns
    (id, hop) — the frontier id set with its first-reached hop distance.
    Each hop is one (broadcastable) equi join against the edge table;
    Cypher variable-length patterns map to a loop of joins exactly like
    this at any scale.
    """
    e = edges
    if rel_types:
        e = e.where(F.col("type").isin(rel_types))
    if direction == "out":
        pairs = e.select(F.col("start_node_id").alias("src"), F.col("end_node_id").alias("dst"))
    elif direction == "in":
        pairs = e.select(F.col("end_node_id").alias("src"), F.col("start_node_id").alias("dst"))
    else:
        pairs = e.select(
            F.col("start_node_id").alias("src"), F.col("end_node_id").alias("dst")
        ).unionByName(
            e.select(F.col("end_node_id").alias("src"), F.col("start_node_id").alias("dst"))
        )
    visited = start_ids.select("id", F.lit(0).alias("hop"))
    frontier = visited
    for h in range(1, hops + 1):
        neighbors = (
            frontier.join(pairs, frontier.id == pairs.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .select("id", F.lit(h).alias("hop"))
        )
        neighbors = neighbors.persist()
        if neighbors.isEmpty():
            break
        visited = visited.unionByName(neighbors).persist()
        frontier = neighbors
    return visited


def hybrid_search(
    nodes: DataFrame,
    query_text: str,
    top_k: int = 5,
    alpha: float | None = None,
    text_property: str = "name",
    fulltext_index: DataFrame | None = None,
) -> DataFrame:
    """Vector ∪ fulltext with max-normalized fusion (reference
    HybridRetriever semantics; alpha=None → naive max fusion).

    Pass a prebuilt ``fulltext_index`` (build_fulltext_index) to use the
    join-based inverted-index path instead of the full scan.  NOTE: the
    two fulltext paths differ in MATCH semantics, not just plan shape —
    the scan scores substring containment per term, the index scores
    exact whole-token matches (Lucene-style analysis); identical results
    only for whole-token queries (asserted in tests)."""
    v = vector_search(nodes, query_text=query_text, top_k=top_k * 4)
    if fulltext_index is not None:
        ft = fulltext_search_indexed(fulltext_index, query_text, top_k=top_k * 4)
    else:
        ft = fulltext_search(nodes, query_text, text_property, top_k=top_k * 4)
    return hybrid_fusion(v, ft, alpha=alpha, k=top_k)
