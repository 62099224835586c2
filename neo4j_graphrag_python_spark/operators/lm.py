"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. 2020 score web pages by the perplexity of a
reference-corpus LM; docs far from the reference distribution score
low).  This is the third leg of the quality suite next to the heuristic
scores (text_analysis.quality_score) and the trained linear classifier
(training.fit_linear_classifier).

Model: bigram LM with add-k smoothing over the corpus tokenizer's
whitespace tokens,

    P(w2 | w1) = (c(w1, w2) + k) / (c(w1) + k·V)

with V = distinct-unigram count of the training corpus and c(·)=0 for
unseen events (an unseen context degenerates to the uniform 1/V).
Log-probs are rounded to 1e-6 and carried as scaled LONGs, so the
per-doc sum is fold-order-exact and the whole operator (train + score)
is bit-deterministic across runs, partitionings, and engines — the same
quantization discipline as the linear classifier, which is what makes
an exact SQL oracle possible despite ln()/cross-engine ULP skew.

Plan shape at 100 TB: training is two map-side-combinable groupBys over
exploded bigrams/unigrams (narrow string rows; text never shuffles).
Scoring explodes each doc's bigrams JVM-side (``slice``+``arrays_zip``,
no Python), equi-joins the bigram table on (w1, w2) and the context
table on w1 — both plain shuffle joins that scale with token count, or
broadcast joins when the model is vocabulary-bounded — then one groupBy
per doc over (long) log-prob rows.  The LM tables are reusable
DataFrames: train once on the reference corpus, score any stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graphrag_python_spark.operators.text_analysis import _tokens

_SCALE = 1_000_000


def _bigrams(toks):
    """(w1, w2) pairs of adjacent tokens, JVM-side."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("w1"),
            F.slice(toks, 2, n - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, int]:
    """Fit the count tables: returns (bigrams, contexts, vocab_size).

    ``bigrams`` = (w1, w2, c); ``contexts`` = (w1, ctx_c) with ctx_c the
    number of bigrams whose context is w1 (NOT the unigram frequency —
    the denominator must count prediction events, so a document's last
    token contributes context mass only via its predecessor).
    """
    from neo4j_graphrag_python_spark.operators.dedup import widen_for_compute

    toks = _tokens(F.col(text_col))
    # widen before tokenization (1-2 scan tasks at bench scale would run
    # it single-threaded); explode_outer + null filter instead of explode
    # so the optimizer does not infer a size(_bigrams(...)) > 0 filter
    # and push the whole bigram construction below the widening exchange
    # (identical rows: explode drops empty arrays, explode_outer turns
    # them into one NULL row which the filter removes)
    wide = widen_for_compute(docs)
    pairs = (
        wide.select(F.explode_outer(_bigrams(toks)).alias("p"))
        .where(F.col("p").isNotNull())
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bigrams = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    # context mass folds out of the bigram table
    # (ctx_c(w1) = Σ_w2 c(w1, w2) — exactly the old count over pairs):
    # the second aggregation's input is vocab-bounded, not
    # corpus-bounded.  (Materializing bigrams with a localCheckpoint was
    # tried and reverted: it erases the aggregate's hash partitioning,
    # forcing an extra exchange into the scoring join — measured ~0.6s
    # slower at sf0.1.)
    contexts = bigrams.groupBy("w1").agg(F.sum("c").alias("ctx_c"))
    vocab_size = (
        wide.select(F.explode_outer(toks).alias("w"))
        .where(F.col("w").isNotNull())
        .select("w")
        .distinct()
        .count()
    )
    return bigrams, contexts, vocab_size


def score_perplexity(
    docs: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    k: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score each doc: (id, n_bigrams, avg_logp) under the trained LM.

    ``avg_logp`` = mean over the doc's bigrams of
    ``round(ln(P(w2|w1)), 6)`` (scaled-long sum ÷ count, re-rounded to
    6); docs with fewer than two tokens get n_bigrams=0 and NULL
    avg_logp.  Perplexity = exp(−avg_logp) is monotone in this, so
    filtering thresholds are expressed on avg_logp directly and no
    second rounding layer is introduced.
    """
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive")
    if k <= 0:
        raise ValueError("add-k smoothing needs k > 0")
    from neo4j_graphrag_python_spark.operators.dedup import widen_for_compute

    toks = _tokens(F.col(text_col))
    doc_pairs = widen_for_compute(docs).select(
        F.col(id_col).alias("id"), F.explode_outer(_bigrams(toks)).alias("p")
    ).select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    kv = float(k) * float(vocab_size)
    # logp6 = round(ln((c+k)/(ctx_c+k*V)), 6)*1e6 as LONG; unseen events
    # coalesce to c=0 / ctx_c=0
    joined = (
        doc_pairs.join(bigrams, ["w1", "w2"], "left")
        .join(contexts, "w1", "left")
        .select(
            "id",
            F.col("w1"),
            F.when(
                F.col("w1").isNotNull(),
                F.round(
                    F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(k)))
                        / (
                            F.coalesce(F.col("ctx_c"), F.lit(0))
                            + F.lit(kv)
                        )
                    )
                    * F.lit(float(_SCALE))
                )
                .cast("long"),
            ).alias("logp6"),
        )
    )
    # the mean is rounded to 1e-6 **in integer arithmetic**:
    # avg6 = sign(s)·⌊(2·|s| + n) / (2n)⌋ is round-half-away-from-zero of
    # s/n on LONGs.  A float `round(sum/(n·1e6), 6)` here is a trap the
    # property test caught: the mean can land exactly on a 5e-7 boundary
    # (e.g. sum6=−2690946, n=4 → −0.6727365) where Spark (HALF_UP),
    # Python (banker's) and DuckDB (double ulp) disagree — integer
    # division has no boundary.
    avg6 = F.expr(
        "CASE WHEN count(logp6) > 0 THEN "
        "CAST(signum(sum(logp6)) AS BIGINT) * "
        "((2 * abs(sum(logp6)) + count(logp6)) div (2 * count(logp6))) "
        "END"  # `div` = integral division on LONGs, no double precision
    )
    return joined.groupBy("id").agg(
        F.count("logp6").cast("long").alias("n_bigrams"),
        (avg6 / F.lit(float(_SCALE))).alias("avg_logp"),
    )


def lm_perplexity_sql(
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> str:
    """DuckDB replica of train-on-corpus + score-corpus (self-scoring),
    kept beside the implementation so the two recurrences are reviewed
    together.  Bigrams via lag() over token position."""
    return rf"""
WITH arrs AS (
  SELECT {id_col} AS id,
         regexp_split_to_array(trim(lower({text_col})), '\s+') AS arr
  FROM {docs_table} WHERE trim({text_col}) <> ''
),
pairs AS (
  SELECT id, arr[CAST(i AS INT)] AS w1, arr[CAST(i AS INT) + 1] AS w2
  FROM arrs,
       unnest(range(1, greatest(len(arr) - 1, 0) + 1)) AS t(i)
),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(count(*) AS BIGINT) AS ctx_c FROM pairs GROUP BY 1),
v AS (
  SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vs
  FROM (SELECT unnest(arr) AS w FROM arrs)
),
scored AS (
  SELECT p.id,
         CAST(round(ln((COALESCE(b.c, 0) + {float(k)})
                       / (COALESCE(x.ctx_c, 0) + {float(k)} * v.vs))
                    * 1000000.0) AS BIGINT) AS logp6
  FROM pairs p
  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
  LEFT JOIN ctx x ON x.w1 = p.w1, v
)
SELECT d.{id_col} AS id,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_bigrams,
       s.avg_logp
FROM {docs_table} d
LEFT JOIN (
  -- integer round-half-away-from-zero of sum/n (see score_perplexity:
  -- a float round() here hits 5e-7 boundary disagreements)
  SELECT id, count(*) AS n,
         sign(SUM(logp6))
           * ((2 * abs(SUM(logp6)) + count(*)) // (2 * count(*)))
           / 1000000.0 AS avg_logp
  FROM scored GROUP BY id
) s ON s.id = d.{id_col}
"""
