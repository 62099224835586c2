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
