"""End-to-end corpus curation: the standard pretraining data chain —
model-based quality filter → exact dedup → temperature mixing — as one
composed Spark plan.

Each stage is an existing operator; the composition is what a real
100 TB curation job runs, and every stage is deterministic (scaled-long
classifier sums, md5 dedup keys, md5 sampling filter), so the FULL
chain's output row set is exactly reproducible and oracle-checkable —
not just each stage in isolation.

Plan shape: the classifier contributes one explode→broadcast-join→
combinable groupBy; dedup one hash groupBy of (id, md5) narrow rows;
mixing a tiny count aggregate + broadcast join + partition-local
filter.  Text is projected away before every inter-stage join — only
(id, stratum, score) rows move between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graphrag_python_spark.operators.dedup import dedup_exact
from neo4j_graphrag_python_spark.operators.sampling import temperature_mix
from neo4j_graphrag_python_spark.operators.text_analysis import (
    linear_quality_classifier,
)


def curate_corpus(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    bias: float = 0.0,
    threshold: float = 0.5,
    alpha: float = 1.0,
    budget_docs: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Quality-filter, dedup, and temperature-mix a document corpus.

    Returns ``(curated, rates)``: the kept rows as
    ``(id, stratum, score, rate)`` plus the per-stratum rate table.
    Stage order matters and is the standard one — dedup runs on the
    quality survivors (junk pages are the most duplicated, so filtering
    first shrinks the dedup input), and mixing rates are computed over
    the DEDUPED inventory (otherwise duplicate-heavy strata are
    over-budgeted).
    """
    scores = linear_quality_classifier(
        docs, vocab, bias=bias, threshold=threshold,
        id_col=id_col, text_col=text_col,
    )
    kept = docs.join(
        scores.where(F.col("keep")).select(
            F.col("id").alias(id_col), "score"
        ),
        id_col,
    )
    assignments, _groups = dedup_exact(kept, id_col=id_col, text_col=text_col)
    keepers = assignments.where(
        F.col("id") == F.col("keeper_id")
    ).select(F.col("id").alias(id_col))
    # text is no longer needed — only narrow rows cross the join
    surv = kept.select(id_col, strata_col, "score").join(keepers, id_col)
    mixed, rates = temperature_mix(
        surv,
        alpha=alpha,
        budget_docs=budget_docs,
        strata_col=strata_col,
        key_col=id_col,
        salt=salt,
    )
    return mixed.select(id_col, strata_col, "score", "rate"), rates
