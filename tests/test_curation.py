"""Composed curation chain (quality filter → exact dedup → temperature mix).

The sf0.01 contract fixture has no exact duplicates, so the dedup stage
is a pass-through there; this test plants duplicates so each stage's
effect on the END-TO-END output is observable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_graphrag_python_spark.plans.curation import curate_corpus


def _corpus(spark):
    # 3 langs; "good" docs hit the vocab token, junk docs don't.
    # Junk is also the duplicated content (the realistic correlation).
    rows = []
    for i in range(40):
        rows.append((i, "en", f"research evidence unique-{i}"))
    for i in range(40, 60):
        rows.append((i, "fr", f"research evidence fr-{i}"))
    # planted exact duplicates among GOOD docs: ids 100..109 share one text
    for i in range(100, 110):
        rows.append((i, "en", "research evidence duplicated body"))
    # junk (no vocab hits -> score sigmoid(-1.0) < 0.5 -> dropped)
    for i in range(200, 220):
        rows.append((i, "de", f"click here buy now {i % 3}"))
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def _vocab(spark):
    return spark.createDataFrame(
        [("research", 1.0), ("evidence", 1.0)], ["token", "weight"]
    )


def test_curate_chain_stages(spark):
    docs = _corpus(spark)
    curated, rates = curate_corpus(
        docs,
        _vocab(spark),
        bias=-1.0,
        threshold=0.5,
        alpha=0.5,
        budget_docs=10_000,  # budget >> corpus => rate 1.0, mixing is identity
        strata_col="lang",
    )
    got = {r.doc_id: r for r in curated.collect()}
    # junk (de) all dropped by the classifier
    assert not any(200 <= i < 220 for i in got)
    rate_rows = {r.lang: r for r in rates.collect()}
    assert "de" not in rate_rows  # rates computed over survivors only
    # planted duplicate cluster collapsed to its min-id keeper
    assert 100 in got and not any(101 <= i < 110 for i in got)
    # unique good docs all survive (rate 1.0 at this budget)
    assert all(i in got for i in range(60))
    assert all(abs(r.rate - 1.0) < 1e-9 for r in rate_rows.values())
    # score column carries the classifier score: sigmoid(2 - 1) rounded
    assert abs(got[0].score - 0.731059) < 1e-6


def test_curate_rates_over_deduped_inventory(spark):
    """Rates must be computed AFTER dedup: a duplicate-heavy stratum
    must not be budgeted for its duplicated copies."""
    docs = _corpus(spark)
    _, rates = curate_corpus(
        docs,
        _vocab(spark),
        bias=-1.0,
        threshold=0.5,
        alpha=1.0,  # natural proportions -> rate = budget / total
        budget_docs=30,
        strata_col="lang",
    )
    n = {r.lang: r.n_docs for r in rates.collect()}
    # en: 40 unique + 1 keeper (not 10 duplicates), fr: 20
    assert n == {"en": 41, "fr": 20}


def test_curate_deterministic(spark):
    docs = _corpus(spark)
    kw = dict(bias=-1.0, threshold=0.5, alpha=0.5, budget_docs=25,
              strata_col="lang")
    a, _ = curate_corpus(docs, _vocab(spark), **kw)
    b, _ = curate_corpus(docs.repartition(7), _vocab(spark), **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # sampled: strictly fewer rows than survivors, none from junk/dupes
    ids = [r.doc_id for r in a.collect()]
    assert 0 < len(ids) < 61
    assert all(i < 110 for i in ids)


def test_curate_schema_and_empty_corpus(spark):
    docs = _corpus(spark)
    curated, rates = curate_corpus(
        docs, _vocab(spark), bias=-1.0, threshold=0.5,
        alpha=0.5, budget_docs=100, strata_col="lang",
    )
    assert curated.columns == ["doc_id", "lang", "score", "rate"]
    empty = docs.where(F.lit(False))
    c2, r2 = curate_corpus(
        empty, _vocab(spark), bias=-1.0, threshold=0.5,
        alpha=0.5, budget_docs=100, strata_col="lang",
    )
    assert c2.count() == 0 and r2.count() == 0
