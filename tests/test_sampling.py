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


def test_temperature_mix_rates_and_rows(docs, spark) -> None:
    """alpha<1 must up-weight tail strata relative to natural share,
    the row set must be deterministic, and the expected kept counts
    must track budget*q_s."""
    from neo4j_graphrag_python_spark.operators.sampling import temperature_mix

    mixed, rates = temperature_mix(
        docs, alpha=0.5, budget_docs=300, strata_col="lang",
        key_col="doc_id",
    )
    r = {x["lang"]: x.asDict() for x in rates.collect()}
    n_total = sum(v["n_docs"] for v in r.values())
    # alpha=0.5 gives every smaller stratum a HIGHER rate than the
    # head stratum (rate ∝ n^(alpha-1) is decreasing in n)
    head = max(r.values(), key=lambda v: v["n_docs"])
    for v in r.values():
        if v["n_docs"] < head["n_docs"]:
            assert v["rate"] >= head["rate"], (v, head)
    # replicate the rate arithmetic straight-line
    import math

    sq = sum(math.sqrt(v["n_docs"]) for v in r.values())
    for v in r.values():
        want = min(1.0, 300.0 * (math.sqrt(v["n_docs"]) / sq) / v["n_docs"])
        assert abs(v["rate"] - want) < 1e-6, (v, want)
    # rows: deterministic re-run, and every kept row passes the md5 test
    a = {x["doc_id"] for x in mixed.select("doc_id").collect()}
    mixed2, _ = temperature_mix(
        docs, alpha=0.5, budget_docs=300, strata_col="lang",
        key_col="doc_id",
    )
    assert a == {x["doc_id"] for x in mixed2.select("doc_id").collect()}
    assert 0 < len(a) < n_total


def test_temperature_mix_alpha1_is_proportional_and_validates(docs) -> None:
    from neo4j_graphrag_python_spark.operators.sampling import temperature_mix

    _, rates = temperature_mix(
        docs, alpha=1.0, budget_docs=100, strata_col="lang",
        key_col="doc_id",
    )
    n_total = sum(r["n_docs"] for r in rates.collect())
    # alpha=1: q_s = n_s/N, so every stratum gets the SAME rate B/N
    vals = {r["rate"] for r in rates.collect()}
    assert len(vals) == 1
    assert abs(next(iter(vals)) - 100.0 / n_total) < 1e-6
    with pytest.raises(ValueError):
        temperature_mix(docs, alpha=-0.1, budget_docs=10,
                        strata_col="lang", key_col="doc_id")
    with pytest.raises(ValueError):
        temperature_mix(docs, alpha=0.5, budget_docs=-1,
                        strata_col="lang", key_col="doc_id")


def test_temperature_mix_rate_capped_at_one(spark) -> None:
    """A budget larger than the corpus caps every rate at 1.0 and keeps
    every row."""
    from neo4j_graphrag_python_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame(
        [(i, "x", "en" if i % 3 else "fr") for i in range(30)],
        "doc_id long, text string, lang string",
    )
    mixed, rates = temperature_mix(
        df, alpha=0.3, budget_docs=10_000, strata_col="lang",
        key_col="doc_id",
    )
    assert all(r["rate"] == 1.0 for r in rates.collect())
    assert mixed.count() == 30


def test_leakage_safe_split_pairs_never_straddle(spark) -> None:
    """Every near-dup pair (and its transitive closure) lands on ONE
    side; singletons split ~holdout_frac; the draw is deterministic."""
    import random as _r

    from neo4j_graphrag_python_spark.operators.sampling import (
        leakage_safe_split,
    )

    rng = _r.Random(5)
    n = 2000
    docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    # chains of near-dups: 200 random pairs (some overlapping -> bigger
    # transitive components)
    prs = [(a, a + rng.randint(1, 3)) for a in rng.sample(range(n - 3), 200)]
    pairs = spark.createDataFrame(prs, ["id_a", "id_b"])
    out = leakage_safe_split(docs, pairs, holdout_frac=0.2)
    rows = {r["id"]: (r["component_id"], r["split"]) for r in out.collect()}
    assert len(rows) == n
    for a, b in prs:
        assert rows[a] == rows[b], (a, b)  # same component AND same side
    frac = sum(1 for v in rows.values() if v[1] == "holdout") / n
    assert 0.12 < frac < 0.28
    # deterministic: identical on re-run
    again = {
        r["id"]: (r["component_id"], r["split"])
        for r in leakage_safe_split(docs, pairs, holdout_frac=0.2).collect()
    }
    assert again == rows
    # a different salt draws an independent split
    other = {
        r["id"]: r["split"]
        for r in leakage_safe_split(
            docs, pairs, holdout_frac=0.2, salt="v2"
        ).collect()
    }
    assert any(other[i] != rows[i][1] for i in rows)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, holdout_frac=1.5)
