"""Text-analysis operators for corpus curation at scale.

All hot paths are built-in column expressions (codegen'd, pushdown-safe);
the only pandas UDF is the rolling-hash fingerprint where per-char state
is genuinely imperative.

  * token_stats        — token/char counts, distinct tokens (built-ins)
  * quality_score      — length/punct/alpha/stopword heuristics (built-ins)
  * language_id        — stopword-profile n-gram heuristic (built-ins:
                         per-language hit counts via array intersection)
  * doc_fingerprint    — Rabin-Karp rolling hash windows → winnowed
                         document fingerprint set (pandas UDF)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# tiny embedded stopword profiles (public knowledge, top function words)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
}


def _tokens(text_col: Column) -> Column:
    trimmed = F.trim(F.lower(text_col))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    toks = _tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.aggregate(
                    toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
                )
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


# GPT-2-style pre-tokenizer shape, RE2-safe (no lookahead): contraction
# suffixes, letter runs, digit runs, punctuation runs, whitespace runs.
# Counting matches approximates BPE pre-token count (each pre-token maps to
# ≥1 BPE token; the ratio is stable for cost estimation).
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """BPE-ish pre-token counts per document — whitespace tokens undercount
    punctuation-heavy text badly; this is the standard cost-estimation
    tokenizer shape.  JVM-side regexp_extract_all, no Python."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit(BPE_ISH_PATTERN),
                F.lit(0),
            )
        ).cast("long").alias("n_bpe_tokens"),
    )


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality signals + a composite score in [0,1] — the usual
    pre-training corpus filters (length, alpha ratio, repetition)."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    digit_chars = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    n_tokens = F.size(toks)
    distinct_ratio = F.when(
        n_tokens > 0, F.size(F.array_distinct(toks)) / n_tokens
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, digit_chars / n_chars).otherwise(F.lit(0.0))
    length_ok = (n_tokens >= 5) & (n_tokens <= 100000)
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + alpha_ratio * 0.3
        + distinct_ratio * 0.3
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_token_ratio"),
        length_ok.alias("length_ok"),
        F.round(score, 6).alias("quality"),
    )


def linear_quality_classifier(
    df: DataFrame,
    vocab: DataFrame,
    bias: float = 0.0,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-based quality filtering: score each document with a linear
    bag-of-words classifier (the CCNet / GPT-3 quality-filter shape — a
    trained linear model over token features; fastText reduces to
    exactly this at inference).  ``vocab`` is a (token, weight) table —
    the trained model's non-zero features.  Returns
    ``(id, n_hits, logit, score, keep)`` with
    ``score = sigmoid(bias + Σ weight[token])`` over ALL token
    occurrences (bag-of-words counts, not distinct) and
    ``keep = round(score, 6) >= threshold`` (computed from the rounded
    score so cross-engine exp() ULP differences cannot flip it).

    Weights are quantized to 1e-6 and summed as LONGs: a float sum over
    a shuffled groupBy is fold-order-nondeterministic in its last bits,
    but the scaled-integer sum is exact in any order (every |logit| <
    9·10⁹ here), so the operator is bit-deterministic across runs,
    partitionings, and engines.

    Plan shape for 100 TB: one scan — tokens ``explode_outer`` (empty
    docs survive as a NULL token), broadcast-join the vocabulary
    (models have 10⁴-10⁶ non-zero features — always broadcastable),
    then one map-side-combinable groupBy(id) sum.  The text column is
    dropped before the shuffle; only (id, weight) rows move.  No
    Python anywhere.
    """
    from neo4j_graphrag_python_spark.operators.dedup import widen_for_compute

    toks = _tokens(F.col(text_col))
    # widen before the tokenize+explode (I/O-sized scans are 1-2 tasks at
    # bench scale); explode_outer infers no pushed filter, so no
    # checkpoint is needed
    exploded = widen_for_compute(df).select(
        F.col(id_col).alias("id"), F.explode_outer(toks).alias("tok")
    )
    w_scaled = F.round(vocab["weight"] * 1e6).cast("long")
    scored = (
        exploded.join(F.broadcast(vocab), exploded["tok"] == vocab["token"], "left")
        .groupBy("id")
        .agg(
            F.count(vocab["weight"]).alias("n_hits"),
            F.coalesce(F.sum(w_scaled), F.lit(0)).alias("_wsum6"),
        )
    )
    logit = F.col("_wsum6") / F.lit(1e6) + F.lit(float(bias))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return scored.select(
        "id",
        "n_hits",
        F.round(logit, 6).alias("logit"),
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-profile language guess → (id, lang_pred, lang_hits).

    Per language: count tokens present in its profile (array_intersect on
    distinct tokens would lose counts — use filter+array_contains).  All
    built-ins; profiles are literal arrays folded into the plan.
    """
    toks = _tokens(F.col(text_col))
    hit_cols = []
    for lang, words in STOPWORDS.items():
        wl = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))
        hit_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*hit_cols))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "lang_pred"
        ),
        best["hits"].cast("long").alias("lang_hits"),
    )


def winnow_fingerprints(
    text: str, window: int = 8, keep_every: int = 4
) -> list[int]:
    """Winnowed Rabin-Karp fingerprints of one text — the pure per-doc
    core shared by the Spark stage below AND the offline oracle fixture
    (``__spark_entry__._ensure_fingerprints_fixture``), so the DuckDB
    value gate pins the distributed plumbing around the identical scalar
    function (same pattern as ``simhash64``).

    Rolling polynomial hash over char windows; keep the minimum hash of
    every ``keep_every`` consecutive windows (winnowing) — standard
    near-dup / plagiarism fingerprinting.
    """
    B, M = 1_000_003, (1 << 61) - 1
    t = (text or "").lower()
    if len(t) < window:
        return []
    hashes = []
    h = 0
    power = pow(B, window - 1, M)
    for i, ch in enumerate(t):
        h = (h * B + ord(ch)) % M
        if i >= window - 1:
            hashes.append(h)
            h = (h - ord(t[i - window + 1]) * power) % M
    return [
        min(hashes[j : j + keep_every])
        for j in range(0, len(hashes), keep_every)
    ]


def doc_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    keep_every: int = 4,
) -> DataFrame:
    """Winnowed fingerprints → (id, fingerprint) exploded rows.

    Imperative per-char state ⇒ pandas UDF (Arrow-batched) around
    :func:`winnow_fingerprints`.
    """

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, prints = [], []
        for pdf in batches:
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for f in winnow_fingerprints(text, window, keep_every):
                    ids.append(did)
                    prints.append(f)
            yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"),
                                "fingerprint": pd.Series(prints, dtype="int64")})
            ids, prints = [], []

    from neo4j_graphrag_python_spark.operators.dedup import widen_for_compute

    # rolling-hash winnowing is ~10² ops per input byte: widen past the
    # I/O-sized scan partitioning or a few MB of text pins 1-2 tasks
    return widen_for_compute(df.select(id_col, text_col)).mapInPandas(
        fp, schema="id long, fingerprint long"
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# ASCII-explicit patterns, deliberately restricted to syntax shared by
# Java regex (Spark) and RE2 (DuckDB/production scanners): character
# classes, bounded repetition, alternation — no lookaround, no \d/\w
# (unicode semantics differ across engines).  Order matters: URLs before
# emails (a URL may contain '@'), emails before phones (digits in hosts).
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    # explicit whitespace class: Java's \s includes \x0B, RE2's does not —
    # [^\s] would silently diverge between Spark and the DuckDB oracle
    ("url", "https?://[^ \\t\\n\\r\\f]+", "<URL>"),
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,14}[0-9]", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: "list[tuple[str, str, str]] | None" = None,
) -> DataFrame:
    """Redact PII-shaped spans (URLs, emails, IPv4s, phone numbers) —
    the standard pre-training scrub pass.  → (id, clean_text,
    n_<kind> … counts per pattern).

    Pure built-in expressions: one ``regexp_count`` + one
    ``regexp_replace`` per pattern, all fused into a single codegen'd
    projection — no shuffle, no Python, scales linearly with the scan.
    Counts are computed BEFORE replacement (on the original text) so a
    later pattern can't hide an earlier kind's matches.
    """
    # `or` would silently swap an explicit empty pattern list (meaning
    # "scrub nothing") for the defaults
    pats = patterns if patterns is not None else PII_PATTERNS
    text = F.coalesce(F.col(text_col), F.lit(""))
    cols = [F.col(id_col).alias("id")]
    for kind, rx, _repl in pats:
        cols.append(
            F.regexp_count(text, F.lit(rx)).cast("long").alias(f"n_{kind}")
        )
    clean = text
    for _kind, rx, repl in pats:
        clean = F.regexp_replace(clean, rx, repl)
    cols.insert(1, clean.alias("clean_text"))
    return df.select(*cols)


# ---------------------------------------------------------------------------
# benchmark contamination
# ---------------------------------------------------------------------------


def _ngram_array(toks: Column, n: int) -> Column:
    """Word n-grams (non-distinct, in order) as array<string>.

    ``sequence(1, 0)`` is DESCENDING ``[1, 0]`` in Spark, not empty — a
    doc shorter than n tokens must short-circuit to an empty array or the
    transform feeds ``slice(toks, 0, n)`` and the task throws.
    """
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _word_ngrams(text_col: Column, n: int) -> Column:
    """Distinct word n-grams of a text as array<string> (JVM HOFs)."""
    return F.array_distinct(_ngram_array(_tokens(text_col), n))


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark contamination: the fraction of the doc's
    distinct word n-grams that appear anywhere in the benchmark corpus —
    the standard train/test decontamination check (n-gram overlap à la
    GPT-3 appendix C / PaLM).  → (id, n_grams, n_hit, contamination).

    Plan shape: the benchmark's distinct gram set is aggregated once and
    broadcast (benchmarks are small — eval sets, not corpora); each doc's
    grams explode and semi-join in-map against it, then re-aggregate by
    id.  The corpus side never shuffles its text — only (id, gram) pairs
    of the exploded frame move, and with the broadcast join they move to
    no other executor at all.  Docs shorter than n words report 0 grams
    and 0.0 contamination (they cannot be n-gram contaminated).
    """
    from neo4j_graphrag_python_spark.operators.dedup import widen_for_compute

    bench_grams = (
        benchmark.select(
            F.explode(_word_ngrams(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    # widen before the gram projection: n-gram construction is ~10²
    # string ops per input byte, and an I/O-sized scan (1-2 tasks at
    # bench scale) would run the whole corpus single-threaded (measured
    # 3.3s → 0.4s at sf0.1); explode_outer infers no pushed filter, so
    # no checkpoint is needed here
    doc_grams = widen_for_compute(docs).select(
        F.col(id_col).alias("id"),
        F.explode_outer(_word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    joined = doc_grams.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "gram", "left"
    )
    return joined.groupBy("id").agg(
        F.count("gram").alias("n_grams"),
        F.count("_hit").alias("n_hit"),
        F.round(
            F.when(
                F.count("gram") > 0,
                F.count("_hit") / F.count("gram").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("contamination"),
    )


# ---------------------------------------------------------------------------
# repetition stats (Gopher-style quality filters)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document n-gram repetition (Rae et al. 2021 'Gopher' quality
    filters): the fraction of all n-gram occurrences taken by the single
    most frequent n-gram.  High values flag boilerplate/spam.  →
    (id, n_ngrams, top_ngram_count, top_ngram_frac).

    Shape: explode the n-gram array → count per (id, gram) → max/sum per
    id.  This is LINEAR in document length — a distinct×occurrences HOF
    projection would be shuffle-free but O(len²) per row, and one whale
    document would pin its task (tried first, rejected).  The per-(id,
    gram) counts partially aggregate map-side, so the shuffle carries
    ~distinct grams per doc, and the second aggregation's input is one
    row per distinct gram.  Docs shorter than n tokens survive via the
    left join (0 grams, 0.0 fraction).
    """
    from neo4j_graphrag_python_spark.operators.dedup import widen_for_compute

    ids = df.select(F.col(id_col).alias("id"))
    # widen before the n-gram explode (I/O-sized scans are 1-2 tasks at
    # bench scale); explode_outer + null filter so the inferred
    # size(ngrams)>0 filter does not push the gram construction below
    # the widening exchange (identical rows: explode drops empty arrays,
    # explode_outer turns them into one NULL row which the filter drops)
    grams = (
        widen_for_compute(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode_outer(_ngram_array(_tokens(F.col(text_col)), n)).alias(
                "gram"
            ),
        )
        .where(F.col("gram").isNotNull())
    )
    per_gram = grams.groupBy("id", "gram").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("id").agg(
        F.sum("c").alias("n_ngrams"), F.max("c").alias("top")
    )
    joined = ids.join(per_doc, "id", "left")
    n_ngrams = F.coalesce(F.col("n_ngrams"), F.lit(0))
    top = F.coalesce(F.col("top"), F.lit(0))
    return joined.select(
        "id",
        n_ngrams.cast("long").alias("n_ngrams"),
        top.cast("long").alias("top_ngram_count"),
        F.round(
            F.when(n_ngrams > 0, top / n_ngrams.cast("double")).otherwise(0.0),
            6,
        ).alias("top_ngram_frac"),
    )


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
) -> DataFrame:
    """Span-level exact-substring duplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — the
    cross-document repeated-substring signal their suffix-array pass
    computes; here expressed as fixed-width token windows so the whole
    thing stays in Spark built-ins).  A window is *duplicated* when its
    exact ``window``-token span occurs at more than one (doc, position)
    in the corpus — same-doc repeats count.  → (id, n_windows,
    n_dup_windows, dup_frac), one row per input doc (short docs keep
    0 / 0.0 through the left join).

    Shape: span strings never leave the operator — each window is
    reduced to its 8-byte ``xxhash64`` inside one codegen'd array
    projection, so the explode emits (id, long) rows only.  The per-hash
    corpus count is a map-side-combinable groupBy; the join back is
    hash-only on the 8-byte key, then one more map-side-combinable
    groupBy(id).  At 100 TB every exchange in this plan carries 16-byte
    rows — the corpus text is read exactly once and never shuffled.
    Duplicate detection by 64-bit hash equality admits collisions at
    ~n²/2⁶⁵; at 10¹² windows that is ~3% of ONE window corpus-wide —
    below any curation signal's noise floor (and the contract oracle
    checks the string-exact answer at test scale).
    """
    w = int(window)
    if w < 1:
        raise ValueError("window must be >= 1")
    from neo4j_graphrag_python_spark.operators.dedup import widen_for_compute

    toks = _tokens(F.col(text_col))
    span_hashes = F.transform(_ngram_array(toks, w), lambda g: F.xxhash64(g))
    # materialize the (id, hash array) rows BEFORE the explode.  Two
    # reasons (measured 4-6s → ~0.3s at sf0.1): (a) two consumers (the
    # corpus count and the join back) read the hashes, so the text is
    # scanned and hashed once; (b) explode makes the optimizer infer a
    # ``size(hs) > 0`` filter and push it below the widening exchange —
    # with the heavy projection inlined, the whole window-hash pass runs
    # a SECOND time on the narrow pre-shuffle side (1-2 scan tasks, a
    # straggler that pins the job).  Checkpointing the array frame keeps
    # the inferred filter a cheap size() probe of materialized arrays.
    base = widen_for_compute(df).select(
        F.col(id_col).alias("id"), span_hashes.alias("hs")
    ).localCheckpoint(eager=False)
    wins = base.select("id", F.explode("hs").alias("h"))
    per_hash = wins.groupBy("h").agg(F.count("*").alias("c"))
    per_doc = (
        wins.join(per_hash, "h")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup"),
        )
    )
    joined = df.select(F.col(id_col).alias("id")).join(per_doc, "id", "left")
    n_windows = F.coalesce(F.col("n_windows"), F.lit(0))
    n_dup = F.coalesce(F.col("n_dup"), F.lit(0))
    return joined.select(
        "id",
        n_windows.cast("long").alias("n_windows"),
        n_dup.cast("long").alias("n_dup_windows"),
        F.round(
            F.when(n_windows > 0, n_dup / n_windows.cast("double")).otherwise(
                0.0
            ),
            6,
        ).alias("dup_frac"),
    )


def dedup_spans_apply(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    policy: str = "keep_first",
) -> DataFrame:
    """Exact-substring span REMOVAL (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", §4.1 semantics): cut
    every ``window``-token span whose exact token sequence occurs at more
    than one (doc, position) corpus-wide, merging adjacent/overlapping
    removed windows into maximal spans, and rewrite the corpus.  This is
    the apply stage of :func:`dup_span_stats` — the stats count duplicated
    windows; this operator cuts them.

    → (id, n_windows_removed, n_spans_removed, n_tokens_removed,
    new_text), one row per input doc.  Docs with nothing to cut pass
    their text through BYTE-EXACT (the rewrite projection is skipped for
    them, so tabs/newlines/multi-space runs survive untouched).

    Semantics (all deterministic, replicated by the SQL oracle):

      * A *piece* is one ``\\S+\\s*`` match — a token plus its trailing
        whitespace; ``lead-whitespace || concat(pieces)`` is the original
        text byte-for-byte.  Span identity is the ORIGINAL-CASE tokens
        joined by a single space, i.e. token-granular exactness: two
        spans differing only in internal whitespace are duplicates, and
        the cut removes each occurrence's own original bytes (Lee et al.
        compare raw bytes of tokenized text; this is the same contract at
        token granularity).
      * ``policy="keep_first"`` (default): per span hash, the
        lexicographically minimal (id, pos) occurrence is the keeper and
        survives; every other occurrence is cut.  ``policy="drop_all"``
        cuts every occurrence.  Keeper status is per-SPAN: a keeper
        occurrence can still lose bytes to an overlapping *different*
        duplicated span (same property as the reference algorithm).
      * Cutting a window removes its pieces wholesale — the whitespace
        run INSIDE and TRAILING the cut span goes with it; the whitespace
        preceding the span (the previous kept piece's trailer) stays.

    Shape at 100 TB: the detection pass is exactly dup_span_stats' —
    spans are reduced to 8-byte ``xxhash64`` inside one projection, so
    the explode emits (id, int, long) rows and every detection exchange
    carries ~20-byte rows; the corpus text is never shuffled to detect.
    The per-hash keeper is ``min(struct(id, pos))`` on the same map-side
    combinable groupBy that counts occurrences.  Removal lists collapse
    to one (id, sorted int array) row per AFFECTED doc, and the rewrite
    is a single left join of the source against that map (AQE broadcasts
    it when the dup rate is low — the common case; at worst the text
    shuffles ONCE, the floor for any corpus rewrite) followed by one
    codegen-side projection: an O(|removed|) HOF interval-merge, then an
    O(n_tokens) slice-and-concat fold — no Python, no quadratic
    membership scans.  64-bit hash collisions admit a false cut at
    ~n²/2⁶⁵ windows corpus-wide (see dup_span_stats); the contract
    oracle checks the string-exact answer at test scale.
    """
    w = int(window)
    if w < 1:
        raise ValueError("window must be >= 1")
    if policy not in ("keep_first", "drop_all"):
        raise ValueError("policy must be 'keep_first' or 'drop_all'")
    from neo4j_graphrag_python_spark.operators.dedup import widen_for_compute

    text = F.coalesce(F.col(text_col), F.lit(""))
    pieces = F.expr(
        f"regexp_extract_all(coalesce({text_col}, ''), '\\\\S+\\\\s*', 0)"
    )
    toks = F.transform(pieces, lambda p: F.regexp_replace(p, r"\s+$", ""))
    span_hashes = F.transform(_ngram_array(toks, w), lambda g: F.xxhash64(g))

    # materialize the (id, hash array) rows BEFORE the posexplode — same
    # two reasons as dup_span_stats: two consumers (corpus count+keeper,
    # and the join back) read the hashes, and the explode's inferred
    # ``size(hs) > 0`` filter would otherwise be pushed below the
    # widening exchange with the whole window-hash projection inlined,
    # re-running it on the narrow pre-shuffle side (measured straggler)
    base = widen_for_compute(df).select(
        F.col(id_col).alias("id"), span_hashes.alias("hs")
    ).localCheckpoint(eager=False)
    wins = base.select("id", F.posexplode("hs").alias("pos", "h"))
    per_hash = wins.groupBy("h").agg(
        F.count("*").alias("c"),
        F.min(F.struct("id", "pos")).alias("keeper"),
    )
    removed = wins.join(per_hash, "h").where(F.col("c") > 1)
    if policy == "keep_first":
        removed = removed.where(
            (F.col("id") != F.col("keeper.id"))
            | (F.col("pos") != F.col("keeper.pos"))
        )
    rem_per_doc = removed.groupBy("id").agg(
        F.sort_array(F.collect_list("pos")).alias("rps")
    )

    joined = df.select(
        F.col(id_col).alias("id"), text.alias("_text")
    ).join(rem_per_doc, "id", "left")

    # merge sorted window starts into maximal [s, e) token intervals —
    # O(|removed|) fold; adjacency (r == last.e) merges too, the cut
    # region is contiguous either way
    merged = F.expr(
        "aggregate("
        "  rps,"
        "  cast(array() as array<struct<s:int,e:int>>),"
        "  (acc, r) -> case"
        "    when size(acc) > 0 and r <= element_at(acc, -1).e"
        "    then concat(slice(acc, 1, size(acc) - 1),"
        "                array(named_struct("
        "                  's', element_at(acc, -1).s,"
        f"                 'e', greatest(element_at(acc, -1).e, r + {w}))))"
        f"   else concat(acc, array(named_struct('s', r, 'e', r + {w})))"
        "  end)"
    )
    joined = joined.withColumn("_merged", merged).withColumn(
        "_pieces",
        F.when(
            F.col("rps").isNotNull(),
            F.expr("regexp_extract_all(_text, '\\\\S+\\\\s*', 0)"),
        ),
    )
    # assembly: every kept piece appears in exactly one slice ⇒ O(n_tokens)
    new_text = F.when(F.col("rps").isNull(), F.col("_text")).otherwise(
        F.expr(
            "aggregate("
            "  _merged,"
            "  named_struct('prev', 0,"
            "               'acc', regexp_extract(_text, '^\\\\s*', 0)),"
            "  (st, iv) -> named_struct("
            "    'prev', iv.e,"
            "    'acc', concat(st.acc, array_join("
            "      slice(_pieces, st.prev + 1, iv.s - st.prev), ''))),"
            "  st -> concat(st.acc, array_join("
            "    slice(_pieces, st.prev + 1, size(_pieces) - st.prev), '')))"
        )
    )
    n_tok_removed = F.when(F.col("rps").isNull(), F.lit(0)).otherwise(
        F.expr("aggregate(_merged, 0, (a, iv) -> a + (iv.e - iv.s))")
    )
    # size(NULL) is -1 (non-ANSI legacy), not NULL — gate on isNull, not
    # coalesce, so untouched docs report 0
    def _sz(c: str) -> Column:
        return F.when(F.col(c).isNull(), F.lit(0)).otherwise(F.size(c))

    return joined.select(
        "id",
        _sz("rps").cast("long").alias("n_windows_removed"),
        _sz("_merged").cast("long").alias("n_spans_removed"),
        n_tok_removed.cast("long").alias("n_tokens_removed"),
        new_text.alias("new_text"),
    )
