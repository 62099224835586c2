"""Stage — chunk/text embedding as a vectorized pandas UDF.

Reference: TextChunkEmbedder (components/embedder.py:46-78) calls
``embedder.embed_query(chunk.text)`` one chunk at a time; the Spark version
is one Arrow-batched Scalar Iterator pandas UDF — model calls amortize per
batch, and any embedding backend drops in by swapping the ``batch_fn``
(list[str] → np.ndarray) closure, mirroring the Embedder slot
(embeddings/base.py:20-35).

``embed_unique`` implements the reference's embedding cache
(resolver.py:368-385) the DataFrame way: distinct() on text → embed →
join back, so each unique text is embedded exactly once cluster-wide.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from neo4j_graphrag_python_spark.functions.embedding import DEFAULT_DIM, embed_batch

BatchEmbedFn = Callable[[list[str]], np.ndarray]


def make_embed_udf(batch_fn: BatchEmbedFn | None = None, dim: int = DEFAULT_DIM):
    fn = batch_fn or (lambda texts: embed_batch(texts, dim))

    @pandas_udf("array<float>")
    def embed_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in it:
            mat = fn(series.fillna("").tolist())
            yield pd.Series(list(np.asarray(mat, dtype=np.float32)))

    return embed_udf


def embed_column(
    df: DataFrame,
    text_col: str = "text",
    output_col: str = "embedding",
    batch_fn: BatchEmbedFn | None = None,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """df + embedding column (TextChunkEmbedder analog)."""
    return df.withColumn(output_col, make_embed_udf(batch_fn, dim)(F.col(text_col)))


def embed_named_columns(
    df: DataFrame,
    spec: dict[str, str],
    batch_fn: BatchEmbedFn | None = None,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Multi-vector nodes: one named embedding column per entry of
    ``spec`` (output_col → source text column/property).

    Reference parity: ``Neo4jNode.embedding_properties`` is a *dict* of
    named vectors (types.py:78-104) that the writer unwinds into one
    vector property each (neo4j_queries.py:56-66).  The Spark-idiomatic
    representation is one ARRAY<FLOAT> **column per name** — a
    MAP<STRING,ARRAY<FLOAT>> would defeat parquet column pruning, forcing
    every scan to read *all* vectors when a query probes one.  With
    per-name columns, ``vector_search(..., embedding_col=name)`` and
    ``upsert_vectors(..., vec_col=name)`` work unchanged per vector, and a
    scan for one vector reads only that column.

    Source columns may be top-level or ``properties['x']`` map lookups —
    pass the expression string accordingly (e.g. ``"text"`` or
    ``"properties.name"`` via dotted access is NOT supported for maps;
    use :func:`pyspark.sql.functions.col` semantics: map lookups are
    written ``properties['name']`` in the spec).
    """
    out = df
    for output_col, text_col in spec.items():
        out = out.withColumn(
            output_col, make_embed_udf(batch_fn, dim)(F.expr(text_col))
        )
    return out


def embed_unique(
    df: DataFrame,
    text_col: str = "text",
    output_col: str = "embedding",
    batch_fn: BatchEmbedFn | None = None,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Embed each distinct text once, then join back (the distributed
    embedding cache).  Worth it when texts repeat (entity names do)."""
    uniq = df.select(text_col).distinct()
    uniq = embed_column(uniq, text_col, output_col, batch_fn, dim)
    return df.join(uniq, on=text_col, how="left")
