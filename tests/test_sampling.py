"""Deterministic sampling + corpus-stats rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graphrag_python_spark.operators.sampling import (
    corpus_stats_rollup,
    deterministic_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_deterministic_sample_is_stable_and_unbiased(docs) -> None:
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.5, "doc_id").collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, 0.5, "doc_id").collect()}
    assert a == b  # re-run picks identical rows
    n = docs.count()
    assert 0.35 * n < len(a) < 0.65 * n  # roughly the rate
    # a different salt draws an independent sample
    c = {r["doc_id"] for r in deterministic_sample(docs, 0.5, "doc_id", salt="x").collect()}
    assert c != a
    # nested rates: the 0.25 sample is a subset of the 0.5 sample
    d = {r["doc_id"] for r in deterministic_sample(docs, 0.25, "doc_id").collect()}
    assert d <= a


def test_deterministic_sample_no_shuffle(docs) -> None:
    plan = deterministic_sample(docs, 0.5, "doc_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan  # a filter, not a repartition


def test_deterministic_sample_validates_rate(docs) -> None:
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5, "doc_id")


def test_stratified_sample_rates(docs) -> None:
    out = stratified_sample(
        docs, rates={"en": 1.0}, strata_col="lang", key_col="doc_id",
        default_rate=0.0,
    )
    got = out.groupBy("lang").count().collect()
    langs = {r["lang"]: r["count"] for r in got}
    n_en = docs.where(F.col("lang") == "en").count()
    assert langs == {"en": n_en}  # all en kept, every other stratum dropped


def test_corpus_stats_rollup_levels(docs) -> None:
    out = corpus_stats_rollup(docs).collect()
    rows = {(r["lang"], r["source"]): r for r in out}
    total = rows[("<all>", "<all>")]
    assert total["n_docs"] == docs.count()
    # per-lang rows sum to the total
    lang_rows = [r for (l, s), r in rows.items() if s == "<all>" and l != "<all>"]
    assert sum(r["n_docs"] for r in lang_rows) == total["n_docs"]
    # (lang, source) rows sum to their lang row
    for lr in lang_rows:
        fine = [
            r for (l, s), r in rows.items()
            if l == lr["lang"] and s not in ("<all>",)
        ]
        assert sum(r["n_docs"] for r in fine) == lr["n_docs"]


def test_rollup_single_shuffle(docs) -> None:
    """GROUPING SETS must expand inside one aggregation, not three jobs."""
    plan = corpus_stats_rollup(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # expand + final agg exchange only


def test_rollup_distinguishes_null_data_from_rollup_all(spark) -> None:
    """A genuinely NULL stratum value must not collide with the rollup's
    '<all>' sentinel."""
    docs = spark.createDataFrame(
        [
            (1, "a b", "en", None),
            (2, "c d", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {(r["lang"], r["source"]): r["n_docs"]
            for r in corpus_stats_rollup(docs).collect()}
    assert rows[("en", "<null>")] == 1
    assert rows[("en", "web")] == 1
    assert rows[("en", "<all>")] == 2
    assert rows[("<all>", "<all>")] == 2
