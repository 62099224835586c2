"""Distributed training of the linear quality classifier.

`text_analysis.linear_quality_classifier` scores documents with a fixed
(token, weight) model; this module TRAINS that model on labeled docs —
the missing producer in the train → score → curate chain a pretraining
data pipeline runs (CCNet / GPT-3-style quality filters are trained on
"good vs junk" labels exactly like this; fastText without char-grams
reduces to the same linear bag-of-words model).

Algorithm: full-batch logistic-regression gradient descent over a fixed
vocabulary.  Per epoch:

    logit_d = bias + Σ_tok c_{d,tok} · w_tok
    p_d     = round(sigmoid(logit_d), 6)
    g_tok   = Σ_d (p_d − y_d) · c_{d,tok}
    w_tok  ← round(w_tok − lr · g_tok / n_docs, 6)

Every sum runs on **1e-6-scaled LONGs** (weights and residuals are
quantized, counts are ints), so each epoch's aggregation is exact under
any fold order / partitioning — the whole trainer is bit-deterministic
across runs and engines, and its unrolled-epoch SQL translation is an
exact oracle (the same scaled-integer trick as the classifier itself,
text_analysis.py:136-140).  Rounding p to 1e-6 bounds cross-engine
exp() ULP skew the same way the scorer does.

Plan shape at scale: the (doc, token, count) feature table is computed
ONCE (one explode + broadcast vocab join + groupBy) and persisted;
each epoch is then one broadcast join with the vocab-sized weight table
(models have 10⁴-10⁶ non-zero features — always broadcastable), one
map-side-combinable groupBy(doc) for logits, one groupBy(token) for
gradients.  Per-epoch cost is two shuffles of NARROW rows — text is
touched exactly once for the whole training run.  Epochs are a driver
loop only in control flow; no data ever reaches the driver except the
final vocab-sized weight table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graphrag_python_spark.operators.text_analysis import _tokens

_SCALE = 1_000_000


def token_count_features(
    docs: DataFrame,
    vocab_tokens: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, token, c) bag-of-words counts restricted to the vocabulary.

    The training feature table — computed once, reused every epoch.
    ``vocab_tokens`` is a 1-column (token) DataFrame.
    """
    from neo4j_graphrag_python_spark.operators.dedup import widen_for_compute

    # widen before the tokenize+explode: an I/O-sized scan (1-2 tasks at
    # bench scale) would run the whole tokenization single-threaded
    exploded = widen_for_compute(docs).select(
        F.col(id_col).alias("id"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    return (
        exploded.join(F.broadcast(vocab_tokens.select("token")), "token")
        .groupBy("id", "token")
        .agg(F.count("*").cast("long").alias("c"))
    )


def fit_linear_classifier(
    docs: DataFrame,
    labels: DataFrame,
    vocab_tokens: DataFrame,
    epochs: int = 3,
    lr: float = 1.0,
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train (token, weight) by full-batch GD; returns the weight table.

    ``labels`` is (id, y) with y ∈ {0, 1}.  Weights start at 0; ``bias``
    is a fixed prior (not trained — quality vocabularies are built
    against a chosen operating point, and a trainable bias adds a
    non-SQL-friendly second recurrence for little gain at this model
    size).  Docs without labels are ignored; label rows without docs
    contribute nothing (inner joins).
    """
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    spark = docs.sparkSession
    lab = labels.select(
        F.col(id_col).alias("id"), F.col("y").cast("long").alias("y")
    )
    n_docs = lab.count()
    if n_docs == 0:
        raise ValueError("labels is empty")

    # Round 7 epoch shape: one cached (id, counts vector, y) table, then
    # ONE aggregation per epoch with the weight vector inlined as a
    # 12-ish-slot literal — replacing the historical per-epoch
    # broadcast-join + three joins + two shuffles.  Values are identical:
    # dot6/grad6 are exact LONG sums in any order; a doc with no vocab
    # hits has a zero count vector, so (exactly as in the old inner
    # feats⋈resid join) it contributes nothing to the gradient; the
    # weight update replays Spark's ROUND (HALF_UP on the exact decimal
    # of the double) driver-side via decimal.Decimal.
    tokens = [r["token"] for r in vocab_tokens.select("token").collect()]
    tok_idx = {t: i for i, t in enumerate(tokens)}
    idx_df = spark.createDataFrame(
        [(t, i) for t, i in tok_idx.items()], "token string, _ti int"
    )
    feats = token_count_features(docs, vocab_tokens, id_col, text_col)
    cnt_map = F.map_from_entries(
        F.collect_list(F.struct(F.col("_ti"), F.col("c")))
    )
    vec = F.array(
        *[
            F.coalesce(F.element_at(F.col("_m"), F.lit(i)), F.lit(0).cast("long"))
            for i in range(len(tokens))
        ]
    )
    feats_vec = (
        feats.join(F.broadcast(idx_df), "token")
        .groupBy("id")
        .agg(cnt_map.alias("_m"))
        .join(lab, "id")
        .select("id", vec.alias("cv"), "y")
        .persist()
    )

    from decimal import ROUND_HALF_UP, Decimal

    def _spark_round(x: float) -> int:
        # Spark ROUND(double) = HALF_UP on the double's exact decimal
        return int(
            Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    w6 = [0] * len(tokens)
    for _ in range(epochs):
        w_lit = F.array(*[F.lit(int(v)).cast("long") for v in w6])
        dot6 = F.aggregate(
            F.zip_with("cv", w_lit, lambda c, w_: c * w_),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        )
        logit = dot6 / F.lit(float(_SCALE)) + F.lit(float(bias))
        p6 = F.round(
            F.lit(float(_SCALE)) / (F.lit(1.0) + F.exp(-logit))
        ).cast("long")
        resid6 = (p6 - F.col("y") * F.lit(_SCALE)).alias("_r6")
        per_doc = feats_vec.select("cv", resid6)
        grad_row = per_doc.agg(
            *[
                F.sum(F.element_at("cv", i + 1) * F.col("_r6")).alias(f"g{i}")
                for i in range(len(tokens))
            ]
        ).collect()[0]
        w6 = [
            _spark_round(
                w6[i] - float(lr) * float(grad_row[f"g{i}"] or 0) / float(n_docs)
            )
            for i in range(len(tokens))
        ]
    feats_vec.unpersist()
    return spark.createDataFrame(
        [(t, w6[i]) for i, t in enumerate(tokens)], "token string, w6 long"
    ).select("token", (F.col("w6") / F.lit(float(_SCALE))).alias("weight"))


def unrolled_training_sql(
    vocab_values_cte: str,
    epochs: int,
    lr: float,
    bias: float,
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    label_expr: str = "y",
) -> str:
    """The exact DuckDB-SQL replica of :func:`fit_linear_classifier`,
    with epochs unrolled into a CTE chain (w0 → w1 → … → wT).

    ``vocab_values_cte`` is e.g. ``v0(token) AS (VALUES ('a'), ('b'))``;
    ``label_expr`` is a SQL expression over the docs table yielding the
    0/1 label.  Used by the driver-contract oracle; kept next to the
    implementation so the two recurrences are reviewed together.
    """
    head = rf"""WITH {vocab_values_cte},
lab AS (
  SELECT {id_col} AS id, CAST({label_expr} AS BIGINT) AS y
  FROM {docs_table}
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM lab),
tok AS (
  SELECT {id_col} AS id,
         unnest(regexp_split_to_array(trim(lower({text_col})), '\s+')) AS token
  FROM {docs_table} WHERE trim({text_col}) <> ''
),
feats AS (
  SELECT t.id, t.token, CAST(count(*) AS BIGINT) AS c
  FROM tok t JOIN v0 USING (token) JOIN lab ON lab.id = t.id
  GROUP BY t.id, t.token
),
w0 AS (SELECT token, CAST(0 AS BIGINT) AS w6 FROM v0)"""
    parts = [head]
    for e in range(epochs):
        parts.append(
            f""",
dots{e} AS (
  SELECT f.id, SUM(f.c * w.w6) AS dot6
  FROM feats f JOIN w{e} w USING (token) GROUP BY f.id
),
resid{e} AS (
  SELECT lab.id,
         CAST(round(1000000.0 / (1 + exp(-(COALESCE(d.dot6, 0) / 1000000.0
                                           + ({bias}))))) AS BIGINT)
           - lab.y * 1000000 AS resid6
  FROM lab LEFT JOIN dots{e} d ON d.id = lab.id
),
grad{e} AS (
  SELECT f.token, SUM(r.resid6 * f.c) AS g6
  FROM feats f JOIN resid{e} r ON r.id = f.id GROUP BY f.token
),
w{e + 1} AS (
  SELECT w.token,
         CAST(round(w.w6 - ({lr}) * COALESCE(g.g6, 0) / n.n_docs) AS BIGINT)
           AS w6
  FROM w{e} w LEFT JOIN grad{e} g USING (token), n
)"""
        )
    parts.append(
        f"\nSELECT token, w6 / 1000000.0 AS weight FROM w{epochs}\n"
    )
    return "".join(parts)


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich, Haddow, Birch 2016, "Neural Machine
# Translation of Rare Words with Subword Units" — algorithm 1)
# ---------------------------------------------------------------------------

#: symbol delimiter inside a word-state string — chr(31) (ASCII unit
#: separator) never appears in whitespace-tokenized text; words that do
#: contain it are dropped from training (counted, documented)
_BPE_D = "\x1f"
_BPE_DD = _BPE_D * 2
#: end-of-word terminal symbol (standard BPE; makes encode/decode
#: round-trippable because a merge can never span two words)
BPE_EOW = "</w>"


def _bpe_state_col(word) -> "F.Column":
    """word string → delimited symbol-state string: ``DD s1 DD s2 DD …
    DD`` with one char per initial symbol plus the </w> terminal.

    The double delimiter between symbols is what makes the per-merge
    rewrite a LITERAL ``replace``: merging (a, b) rewrites
    ``D a DD b D`` → ``D ab D`` — the pattern consumes one delimiter of
    each boundary, so consecutive overlapping occurrences ("x x x x"
    with merge (x,x) → [xx, xx]) resolve with the standard left-to-right
    non-overlapping greediness, and a symbol that merely PREFIXES
    another (("a","b") vs symbol "by") can never false-match because
    the pattern requires the closing delimiter after ``b``.  Literal
    replace needs no regex escaping and stays inside whole-stage
    codegen in both engines (Spark `replace`, DuckDB `replace`)."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    syms = F.concat(chars, F.array(F.lit(BPE_EOW)))
    return F.concat(
        F.lit(_BPE_DD), F.array_join(syms, _BPE_DD), F.lit(_BPE_DD)
    )


def _bpe_merge_find_repl(a: str, b: str) -> tuple[str, str]:
    return (
        f"{_BPE_D}{a}{_BPE_DD}{b}{_BPE_D}",
        f"{_BPE_D}{a}{b}{_BPE_D}",
    )


def _bpe_adjacent_pairs(state) -> "F.Column":
    """state string → array<struct<a,b>> of ALL adjacent symbol pairs
    (overlaps included — the subword-nmt counting rule)."""
    syms = F.filter(F.split(state, _BPE_DD), lambda s: s != F.lit(""))
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def bpe_word_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over the whitespace-lowercase tokenization (the same
    ``_tokens`` rule the scoring operators use).  ONE corpus scan + one
    map-side-combinable groupBy; everything after trains on this
    vocabulary-bounded table, never the corpus."""
    from neo4j_graphrag_python_spark.operators.dedup import widen_for_compute
    from neo4j_graphrag_python_spark.operators.text_analysis import _tokens

    # widen before the tokenize+explode (I/O-sized scans are 1-2 tasks
    # at bench scale); explode_outer + null filter so the optimizer does
    # not infer a size(tokens)>0 filter and push the tokenization below
    # the widening exchange (identical rows: the '' filter already drops
    # what explode_outer adds for empty docs, and null words join it)
    return (
        widen_for_compute(df)
        .select(F.explode_outer(_tokens(F.col(text_col))).alias("word"))
        .where(
            F.col("word").isNotNull()
            & (F.col("word") != "")
            & ~F.col("word").contains(_BPE_D)
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def bpe_train_merges(
    df: DataFrame,
    num_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Train ``num_merges`` BPE merges on the corpus (Sennrich 2016
    alg. 1): repeatedly count adjacent symbol pairs weighted by word
    frequency, merge the argmax pair everywhere, record it.  Returns
    (merges DataFrame(rank int, left, right, pair_count long), merges
    list) — the DataFrame is the contract surface, the list feeds
    :func:`bpe_encode`.

    Determinism: the argmax tie-breaks by (count DESC, left ASC, right
    ASC) — a total order, so the merge sequence is a pure function of
    the corpus, and the unrolled-iteration SQL oracle replicates it
    exactly (same counting rule, same literal-replace apply, same tie
    order; all integer counts, no float anywhere).

    Scale shape: the corpus text is scanned ONCE (word counting —
    explode + combinable groupBy); every iteration runs on the DISTINCT-
    WORD table (vocabulary-bounded, ≪ corpus) — one pair explode + one
    combinable groupBy + a 1-row argmax collect + one codegen'd literal
    ``replace`` projection.  Per-iteration state is localCheckpointed so
    k iterations don't stack k replace-plans into one lineage (the
    fit_linear_classifier lesson).  This is exactly how distributed BPE
    trainers shard the problem: merge decisions are global argmaxes over
    pair counts, and pair counts are associative sums over words.
    """
    words = (
        bpe_word_counts(df, id_col, text_col)
        .select(_bpe_state_col(F.col("word")).alias("state"), "cnt")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(num_merges)):
        best = (
            words.select(
                F.explode(_bpe_adjacent_pairs(F.col("state"))).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((a, b, c))
        find, repl = _bpe_merge_find_repl(a, b)
        words = words.select(
            F.expr(
                f"replace(state, {_sql_str(find)}, {_sql_str(repl)})"
            ).alias("state"),
            "cnt",
        ).localCheckpoint(eager=True)
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(r + 1, a, b, c) for r, (a, b, c) in enumerate(merges)],
        "rank int, left string, right string, pair_count long",
    )
    return out, merges


def _sql_str(s: str) -> str:
    """SQL single-quoted string literal (the only metachar is ')."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents with a learned merge list → (id, n_bpe_tokens,
    symbols array<string> of the whole doc in order).  One projection:
    per word-state, the k merges apply as k nested literal ``replace``
    calls IN RANK ORDER (BPE's apply rule) — codegen'd, no Python, no
    shuffle."""
    from neo4j_graphrag_python_spark.operators.text_analysis import _tokens

    toks = df.select(
        F.col(id_col).alias("id"),
        F.flatten(
            F.transform(
                _tokens(F.col(text_col)),
                lambda w: F.filter(
                    F.split(_apply_merges_col(w, merges), _BPE_DD),
                    lambda s: s != F.lit(""),
                ),
            )
        ).alias("symbols"),
    )
    return toks.select(
        "id",
        F.size("symbols").cast("long").alias("n_bpe_tokens"),
        "symbols",
    )


def _apply_merges_col(word, merges) -> "F.Column":
    col = _bpe_state_col(word)
    for m in merges:
        find, repl = _bpe_merge_find_repl(m[0], m[1])
        col = F.replace(col, F.lit(find), F.lit(repl))
    return col
