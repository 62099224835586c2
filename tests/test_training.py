"""Distributed linear-classifier training (full-batch GD, scaled-long
exact arithmetic)."""

from __future__ import annotations

import math

import pytest

from neo4j_graphrag_python_spark.operators.text_analysis import (
    linear_quality_classifier,
)
from neo4j_graphrag_python_spark.operators.training import (
    fit_linear_classifier,
    token_count_features,
)

SCALE = 1_000_000


def _rha(x):
    """round half AWAY FROM ZERO — Spark and DuckDB both round double
    halves away from zero (verified by probe: round(-0.5) = -1 in both),
    while Python's round() is banker's; replicas must match the engines."""
    import math

    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _straight_line(rows, labels, vocab, epochs, lr, bias):
    """Pure-Python replica of the scaled-long recurrence."""
    counts = {}
    for doc_id, text in rows:
        t = text.strip().lower()
        toks = t.split() if t else []
        for tok in toks:
            if tok in vocab:
                counts[(doc_id, tok)] = counts.get((doc_id, tok), 0) + 1
    n = len(labels)
    w6 = {t: 0 for t in vocab}
    for _ in range(epochs):
        dots = {}
        for (d, tok), c in counts.items():
            dots[d] = dots.get(d, 0) + c * w6[tok]
        resid = {}
        for d, y in labels.items():
            logit = dots.get(d, 0) / SCALE + bias
            p6 = _rha(SCALE / (1 + math.exp(-logit)))
            resid[d] = p6 - y * SCALE
        g6 = {t: 0 for t in vocab}
        for (d, tok), c in counts.items():
            if d in resid:
                g6[tok] += resid[d] * c
        w6 = {t: _rha(w6[t] - lr * g6[t] / n) for t in vocab}
    return {t: w6[t] / SCALE for t in vocab}


def _fixture(spark):
    rows = [
        (0, "research evidence method"),
        (1, "research research evidence"),
        (2, "buy now click click"),
        (3, "click buy spam spam"),
        (4, "research method results"),
        (5, ""),
    ]
    labels = {0: 1, 1: 1, 2: 0, 3: 0, 4: 1, 5: 0}
    vocab = ["research", "evidence", "method", "click", "buy", "absent"]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    lab = spark.createDataFrame(list(labels.items()), ["doc_id", "y"])
    voc = spark.createDataFrame([(t,) for t in vocab], ["token"])
    return rows, labels, vocab, docs, lab, voc


def test_matches_straight_line_replica(spark):
    rows, labels, vocab, docs, lab, voc = _fixture(spark)
    got = {
        r.token: r.weight
        for r in fit_linear_classifier(
            docs, lab, voc, epochs=3, lr=2.0, bias=-0.1
        ).collect()
    }
    want = _straight_line(rows, labels, set(vocab), 3, 2.0, -0.1)
    assert got == want  # exact, not approx — scaled-long arithmetic


def test_partitioning_invariance(spark):
    _, _, _, docs, lab, voc = _fixture(spark)
    a = fit_linear_classifier(docs, lab, voc, epochs=2, lr=1.0)
    b = fit_linear_classifier(
        docs.repartition(7), lab.repartition(3), voc, epochs=2, lr=1.0
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_trained_model_separates_planted_classes(spark):
    _, _, _, docs, lab, voc = _fixture(spark)
    w = fit_linear_classifier(docs, lab, voc, epochs=8, lr=4.0)
    weights = {r.token: r.weight for r in w.collect()}
    assert weights["research"] > 0 > weights["click"]
    assert weights["absent"] == 0.0  # never observed => never updated
    # feeding the trained table into the scorer separates the classes
    scored = {
        r.id: r.score
        for r in linear_quality_classifier(
            docs, w.selectExpr("token", "weight")
        ).collect()
    }
    assert min(scored[0], scored[1], scored[4]) > max(scored[2], scored[3])


def test_feature_table_and_validation(spark):
    _, _, _, docs, lab, voc = _fixture(spark)
    feats = {
        (r.id, r.token): r.c
        for r in token_count_features(docs, voc).collect()
    }
    assert feats[(1, "research")] == 2 and feats[(2, "click")] == 2
    assert (5, "research") not in feats  # empty doc contributes nothing
    with pytest.raises(ValueError):
        fit_linear_classifier(docs, lab, voc, epochs=0)
    with pytest.raises(ValueError):
        fit_linear_classifier(docs, lab.where("y > 5"), voc)


# --- property-based: random corpora/labels vs the replica ---------------

from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.sampled_from(["research", "click", "spam", "method", "data"])
_doc = st.lists(_words, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(_doc, min_size=1, max_size=6),
    ybits=st.lists(st.integers(0, 1), min_size=6, max_size=6),
    lr=st.sampled_from([0.5, 2.0]),
)
def test_property_matches_replica(spark, docs, ybits, lr):
    rows = list(enumerate(docs))
    labels = {i: ybits[i] for i in range(len(docs))}
    vocab = ["research", "click", "spam", "method", "data"]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    lab = spark.createDataFrame(list(labels.items()), ["doc_id", "y"])
    voc = spark.createDataFrame([(t,) for t in vocab], ["token"])
    got = {
        r.token: r.weight
        for r in fit_linear_classifier(
            df, lab, voc, epochs=2, lr=lr, bias=-0.2
        ).collect()
    }
    assert got == _straight_line(rows, labels, set(vocab), 2, lr, -0.2)


# ---------------------------------------------------------------------------
# BPE tokenizer training
# ---------------------------------------------------------------------------


def _bpe_replica(texts, k):
    """Straight-line Sennrich alg. 1: word counts -> k iterations of
    (overlap-counting pair argmax, left-to-right non-overlapping apply)."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] += 1
    state = {tuple(list(w) + ["</w>"]): c for w, c in words.items()}
    merges = []
    for _ in range(k):
        pc = Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        new_state = {}
        for syms, cnt in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tuple(out)] = new_state.get(tuple(out), 0) + cnt
        state = new_state
    return merges


def test_bpe_train_matches_replica(spark) -> None:
    from neo4j_graphrag_python_spark.operators.training import (
        bpe_train_merges,
    )

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "wider wide widest new",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out, merges = bpe_train_merges(df, num_merges=8)
    exp = _bpe_replica(texts, 8)
    assert merges == exp
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [(r["left"], r["right"], r["pair_count"]) for r in rows] == exp


def test_bpe_overlap_counting_and_greedy_apply(spark) -> None:
    """'x x x x' has THREE overlapping (x,x) pairs per occurrence chain
    (subword-nmt counting) but merging leaves [xx, xx] (left-to-right
    non-overlapping) — and a pair never matches a longer symbol that
    merely starts with its right side."""
    from neo4j_graphrag_python_spark.operators.training import (
        bpe_encode,
        bpe_train_merges,
    )

    df = spark.createDataFrame([(1, "xxxx xxxx by")], ["doc_id", "text"])
    out, merges = bpe_train_merges(df, num_merges=1)
    assert merges[0][:2] == ("x", "x") and merges[0][2] == 6  # 3 per word
    enc = {r["id"]: r["symbols"] for r in bpe_encode(df, merges).collect()}
    assert enc[1] == ["xx", "xx", "</w>", "xx", "xx", "</w>", "b", "y", "</w>"]


def test_bpe_encode_roundtrip(spark) -> None:
    """Decoding = concat symbols and split on </w>: must reproduce the
    lowercase whitespace tokens byte-exactly for every doc — merges can
    never cross a word boundary."""
    from neo4j_graphrag_python_spark.operators.training import (
        bpe_encode,
        bpe_train_merges,
    )

    texts = [
        "The quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "  lowest lower low  ",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    _, merges = bpe_train_merges(df, num_merges=12)
    assert len(merges) == 12
    enc = {r["id"]: r for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        joined = "".join(enc[i]["symbols"])
        decoded = [w for w in joined.split("</w>") if w != ""]
        assert decoded == t.lower().split(), (i, t)
    # merges compress: fewer symbols than characters for real text
    assert enc[0]["n_bpe_tokens"] < len(texts[0])


def test_bpe_exhausts_pairs_gracefully(spark) -> None:
    from neo4j_graphrag_python_spark.operators.training import (
        bpe_train_merges,
    )

    df = spark.createDataFrame([(1, "ab")], ["doc_id", "text"])
    # "ab" -> [a, b, </w>]: only 2+1 merges possible before one symbol
    out, merges = bpe_train_merges(df, num_merges=10)
    assert len(merges) < 10 and out.count() == len(merges)
