"""Bigram-LM perplexity scoring (CCNet-style quality signal)."""

from __future__ import annotations

import math

import pytest

from neo4j_graphrag_python_spark.operators.lm import (
    score_perplexity,
    train_bigram_lm,
)

SCALE = 1_000_000


def _rha(x):
    # round half away from zero (Spark/DuckDB double-round convention)
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _straight_line(train_rows, score_rows, k=1.0):
    def toks(t):
        t = t.strip().lower()
        return t.split() if t else []

    big, ctx, vocab = {}, {}, set()
    for _, text in train_rows:
        ws = toks(text)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    V = len(vocab)
    out = {}
    for doc_id, text in score_rows:
        ws = toks(text)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            out[doc_id] = (0, None)
            continue
        s = 0
        for a, b in pairs:
            p = (big.get((a, b), 0) + k) / (ctx.get(a, 0) + k * V)
            s += _rha(math.log(p) * SCALE)
        n = len(pairs)
        sign = 1 if s >= 0 else -1
        avg6 = sign * ((2 * abs(s) + n) // (2 * n))
        out[doc_id] = (n, avg6 / SCALE)
    return out


TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox runs over the hill"),
    (2, "the lazy dog sleeps under the hill"),
]
SCORE = TRAIN + [
    (10, "zzz qqq xxx yyy zzz"),  # out-of-distribution junk
    (11, "the"),                  # one token -> no bigrams
    (12, ""),                     # empty
]


def _dfs(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    score = spark.createDataFrame(SCORE, ["doc_id", "text"])
    return train, score


def test_matches_straight_line_replica(spark):
    train, score = _dfs(spark)
    big, ctx, V = train_bigram_lm(train)
    got = {
        r.id: (r.n_bigrams, r.avg_logp)
        for r in score_perplexity(score, big, ctx, V, k=0.5).collect()
    }
    want = _straight_line(TRAIN, SCORE, k=0.5)
    assert got == want


def test_junk_scores_below_reference_docs(spark):
    train, score = _dfs(spark)
    big, ctx, V = train_bigram_lm(train)
    got = {
        r.id: r.avg_logp
        for r in score_perplexity(score, big, ctx, V).collect()
    }
    assert all(got[10] < got[i] for i in (0, 1, 2))  # junk = lowest logp
    assert got[11] is None and got[12] is None


def test_partitioning_invariance(spark):
    train, score = _dfs(spark)
    big, ctx, V = train_bigram_lm(train.repartition(5))
    a = score_perplexity(score, big, ctx, V).collect()
    b = score_perplexity(score.repartition(7), big, ctx, V).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_validation(spark):
    train, score = _dfs(spark)
    big, ctx, V = train_bigram_lm(train)
    with pytest.raises(ValueError):
        score_perplexity(score, big, ctx, 0)
    with pytest.raises(ValueError):
        score_perplexity(score, big, ctx, V, k=0.0)


# --- property-based: random corpora vs the straight-line replica --------

from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "zz"])
_doc = st.lists(_words, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


@settings(max_examples=8, deadline=None)
@given(corpus=_corpus, k=st.sampled_from([0.25, 1.0, 2.0]))
def test_property_matches_replica(spark, corpus, k):
    rows = list(enumerate(corpus))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    big, ctx, V = train_bigram_lm(df)
    if V == 0:
        return  # all-empty corpus: nothing to score
    got = {
        r.id: (r.n_bigrams, r.avg_logp)
        for r in score_perplexity(df, big, ctx, V, k=k).collect()
    }
    assert got == _straight_line(rows, rows, k=k)
