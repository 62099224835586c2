"""Dataset curation operators: deterministic sampling + corpus stats.

A 100 TB training-data pipeline samples and accounts constantly — and at
that scale sampling must be DETERMINISTIC (re-runs and resumed jobs pick
identical rows; `df.sample()` does not survive a retry) and SHUFFLE-FREE
(a filter, not a repartition).  Both operators here are pure Catalyst
expressions:

  * hash sampling: keep a row iff the top 32 bits of md5(key) — a
    uniform uint32 — fall below rate·2³².  md5 is chosen over xxhash64
    because every engine speaks it, so cross-engine oracles (DuckDB) can
    verify the exact row set;
  * stratified: per-stratum rates via a broadcast rate table — one
    broadcast join + the same filter, no groupBy;
  * corpus stats: GROUPING SETS rollup (lang × source, lang, total) in
    ONE aggregation pass — three groupBys' worth of answers for one
    shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_U32 = float(1 << 32)


def _hash_unit(key: Column, salt: str) -> Column:
    """Deterministic uniform [0, 1) from a key column (md5 top 32 bits)."""
    h = F.conv(F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 8), 16, 10)
    return h.cast("bigint") / F.lit(_U32)


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Keep ~rate of rows, chosen by content hash — stable across re-runs,
    retries, and engines; no shuffle (a partition-local filter).  Change
    ``salt`` to draw an independent sample."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.where(_hash_unit(F.col(key_col).cast("string"), salt) < rate)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language rates when
    rebalancing a corpus).  The rate table broadcasts; rows in strata
    absent from ``rates`` get ``default_rate``."""
    spark = df.sparkSession
    rate_df = spark.createDataFrame(
        [(k, float(v)) for k, v in rates.items()], [strata_col, "_rate"]
    )
    return (
        df.join(F.broadcast(rate_df), strata_col, "left")
        .where(
            _hash_unit(F.col(key_col).cast("string"), salt)
            < F.coalesce(F.col("_rate"), F.lit(float(default_rate)))
        )
        .drop("_rate")
    )


def temperature_mix(
    df: DataFrame,
    alpha: float,
    budget_docs: int,
    strata_col: str,
    key_col: str,
    salt: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Temperature-based source mixing: resample the corpus so stratum
    s contributes ∝ p_s^α of a ``budget_docs`` total, where p_s is its
    natural share (the multilingual-pretraining α-sampling rule —
    XLM-R / mBERT exponentiated smoothing; α=1 keeps natural
    proportions, α→0 approaches uniform, up-weighting tail sources).

    Returns ``(mixed_df, rates_df)``: the sampled rows plus the
    per-stratum rate table ``(stratum, n_docs, rate)`` with
    ``rate = min(1, budget·q_s / n_s)``, ``q_s = n_s^α / Σ n^α``,
    rounded to 6 decimals — row selection then reuses the deterministic
    md5 filter, so the mix is stable across re-runs and engines and the
    whole operator is one small counting aggregate + one broadcast join
    + a partition-local filter (no data shuffle; strata with
    rate 1.0 pass through whole).

    Rates are derived INSIDE the plan (a window over the tiny
    per-stratum count table), not on the driver — nothing is collected.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if budget_docs < 0:
        raise ValueError("budget_docs must be >= 0")
    from pyspark.sql import Window

    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_docs"))
    w_all = Window.partitionBy()
    q = F.pow(F.col("n_docs").cast("double"), float(alpha))
    rates = counts.select(
        strata_col,
        "n_docs",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(budget_docs))
                * (q / F.sum(q).over(w_all))
                / F.col("n_docs"),
            ),
            6,
        ).alias("rate"),
    )
    mixed = (
        df.join(F.broadcast(rates.drop("n_docs")), strata_col)
        .where(_hash_unit(F.col(key_col).cast("string"), salt) < F.col("rate"))
    )
    return mixed, rates


def corpus_stats_rollup(
    docs: DataFrame,
    lang_col: str = "lang",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Corpus accounting in one aggregation pass: docs/chars/tokens by
    (lang, source), by lang, and in total, via GROUPING SETS — the
    all-levels rows come from one shuffle instead of three jobs.
    NULL group keys are rendered '<all>' so results are join/oracle-safe."""
    toks = F.when(
        F.trim(F.col(text_col)) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    grouped = docs.groupingSets(
        [[lang_col, source_col], [lang_col], []],
        F.col(lang_col),
        F.col(source_col),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(F.col(text_col))).alias("n_chars"),
        F.sum(toks).alias("n_tokens"),
        # grouping() is only legal inside the grouping-sets aggregate
        F.grouping(lang_col).alias("_gl"),
        F.grouping(source_col).alias("_gs"),
    )
    # '<all>' only for ROLLUP nulls (grouping flag == 1); genuinely NULL
    # data values render '<null>' — otherwise a NULL-source group row and
    # the per-lang rollup row would collide on the same key
    def rendered(col: str, flag: str):
        return (
            F.when(F.col(flag) == 1, F.lit("<all>"))
            .otherwise(F.coalesce(F.col(col), F.lit("<null>")))
            .alias(col)
        )

    return grouped.select(
        rendered(lang_col, "_gl"),
        rendered(source_col, "_gs"),
        "n_docs",
        "n_chars",
        "n_tokens",
    )


def leakage_safe_split(
    df: DataFrame,
    near_dup_pairs: DataFrame,
    holdout_frac: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Train/holdout split that near-duplicates can NEVER straddle — the
    decontaminated-split step every training pipeline needs after
    near-dup discovery (a near-dup of a holdout doc in the training set
    is leakage; random per-doc splits produce exactly that).

    Shape: connected components over the near-dup pairs (the same
    min-label propagation as dedup assignment — clusters are tiny after
    blocking), each doc labeled by its component's min id (docs in no
    pair are their own component), then ONE deterministic md5 draw per
    COMPONENT decides the side — so every member of a component lands
    together by construction, re-runs/retries/engines agree (the md5
    unit-interval trick of :func:`deterministic_sample`), and the
    realized holdout fraction concentrates around ``holdout_frac``
    because components are almost all singletons in a deduped corpus.

    → (id, component_id, split∈{'train','holdout'}), one row per input
    doc.  At 100 TB: components shuffle bare id pairs; the final label
    is a partition-local projection after one equi-join of docs against
    the component map.
    """
    if not 0.0 <= holdout_frac <= 1.0:
        raise ValueError("holdout_frac must be in [0, 1]")
    from neo4j_graphrag_python_spark.operators.resolver import (
        connected_components,
    )

    comp = connected_components(near_dup_pairs.select("id_a", "id_b"))
    docs = df.select(F.col(id_col).alias("id"))
    assigned = docs.join(comp, "id", "left").select(
        "id", F.coalesce("canonical_id", "id").alias("component_id")
    )
    side = F.when(
        _hash_unit(F.col("component_id").cast("string"), salt)
        < F.lit(float(holdout_frac)),
        F.lit("holdout"),
    ).otherwise(F.lit("train"))
    return assigned.select("id", "component_id", side.alias("split"))
