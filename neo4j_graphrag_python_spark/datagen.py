"""Deterministic synthetic documents/embeddings fixtures for scales the
driver testdata does not ship (sf ≥ 1).

The driver provides ``/root/testdata/sf{0.001,0.01,0.1}`` read-only;
correctness (oracle) runs stay pinned to those.  Large-scale BENCH runs
need the same table SHAPES at 10-30× the rows, so this module generates
them locally under ``.fixtures/sf<N>/`` with the observed testdata
schemas and data character:

* ``documents(doc_id, text, lang, source, n_chars)`` — word-salad from a
  small vocabulary (what the sf0.1 table contains), zipf-ish language
  and source mixes, and ~4% planted near-duplicates (a prior doc with a
  few words re-rolled) so MinHash/SimHash/Jaccard have true positives
  to find at every scale;
* ``embeddings(vec_id, embedding float[dim], label)`` — a seeded
  gaussian mixture (clustered, like the testdata's labeled vectors) with
  ~2% planted perturbed near-duplicates for the embedding-LSH path.

Row counts scale linearly at the testdata's own ratios
(sf0.1 = 5,000 docs / 2,000 vectors ⇒ 50,000·sf and 20,000·sf).
Everything is seeded and version-independent (stdlib ``random``), so two
runs produce byte-identical parquet — benchmark inputs are reproducible
without shipping data.
"""

from __future__ import annotations

import random
from pathlib import Path

from neo4j_graphrag_python_spark.transcripts import FIXTURE_ROOT

SEED = 1234
DOCS_PER_SF = 50_000
VECS_PER_SF = 20_000
EMBED_DIM = 64
CLUSTER_SIZE = 250  # cluster COUNT grows with n — keeps the same-cluster
# pair population (and thus the near-dup tail) linear in corpus size,
# like real topic distributions; a fixed cluster count would make it
# quadratic

# ~2000-word synthetic vocabulary (syllable products): keeps the corpus'
# noise-floor n-gram Jaccard near zero like real web text.  A tiny
# vocabulary (the first attempt used 48 words) puts random-pair Jaccard
# ≈0.3 — at r=3 LSH banding that makes ~58% of ALL pairs band-collide, a
# quadratic candidate flood no realistic dedup corpus produces (measured:
# 806s for 50k docs, nearly all of it the flooded band join).
_SYL = [
    "ba", "do", "ke", "mi", "ra", "su", "ten", "vor", "lu", "pia",
    "gor", "nef", "tri", "wam", "zel", "qui",
]
_VOCAB = [
    a + b + c for a in _SYL for b in _SYL for c in _SYL[:8]
][:2000]

_LANGS = ["en", "zh", "de", "fr", "es", "ja"]
_LANG_W = [40, 20, 12, 10, 10, 8]


def _doc_words(rng: random.Random) -> list[str]:
    # 30-80 words ≈ the testdata's n_chars (~290 avg): doc length sets the
    # corpus' noise-floor Jaccard for a fixed vocabulary, and 3×-longer
    # docs pushed it near the 0.4 dedup threshold — an adversarial corpus
    # the driver data deliberately isn't
    n = rng.randint(30, 80)
    return [rng.choice(_VOCAB) for _ in range(n)]


def ensure_documents(sf: float, seed: int = SEED) -> str:
    """Write (once) and return ``.fixtures/sf<sf>/documents.parquet``."""
    out = FIXTURE_ROOT / f"sf{sf:g}" / "documents.parquet"
    if out.exists():
        return str(out)
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    n_docs = int(DOCS_PER_SF * sf)
    texts: list[str] = []
    langs, sources = [], []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.04:
            # planted near-duplicate: re-roll a handful of words of a
            # recent doc (bounded lookback keeps dup clusters small)
            base = texts[rng.randrange(max(0, i - 50), i)].split()
            for _ in range(rng.randint(1, 4)):
                base[rng.randrange(len(base))] = rng.choice(_VOCAB)
            words = base
        else:
            words = _doc_words(rng)
        if rng.random() < 0.05:
            # planted PII so pii_scrub's redaction path (not just the
            # scan) is exercised at every scale
            words.append(
                rng.choice(
                    [
                        f"user{i}@example.com",
                        f"https://example.com/d/{i}",
                        "call 555-201-%04d" % rng.randrange(10000),
                        "10.0.%d.%d" % (rng.randrange(256), rng.randrange(256)),
                    ]
                )
            )
        texts.append(" ".join(words))
        langs.append(rng.choices(_LANGS, weights=_LANG_W)[0])
        sources.append(f"src{rng.randrange(8)}")
    out.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        out,
        row_group_size=50_000,
    )
    return str(out)


def ensure_embeddings(sf: float, seed: int = SEED) -> str:
    """Write (once) and return ``.fixtures/sf<sf>/embeddings.parquet``."""
    out = FIXTURE_ROOT / f"sf{sf:g}" / "embeddings.parquet"
    if out.exists():
        return str(out)
    import pyarrow as pa
    import pyarrow.parquet as pq

    import math

    rng = random.Random(seed + 1)
    n = int(VECS_PER_SF * sf)

    def _unit_center() -> list[float]:
        c = [rng.gauss(0.0, 1.0) for _ in range(EMBED_DIM)]
        nrm = math.sqrt(sum(x * x for x in c)) / math.sqrt(EMBED_DIM)
        # fixed norm sqrt(dim): removes the chi-squared spread of |c|
        # that otherwise puts whole clusters above the cosine threshold
        return [x / nrm for x in c]

    n_clusters = max(8, n // CLUSTER_SIZE)
    centers = [_unit_center() for _ in range(n_clusters)]
    vecs: list[list[float]] = []
    labels: list[int] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.02:
            j = rng.randrange(max(0, i - 100), i)
            vecs.append([x + rng.gauss(0.0, 0.01) for x in vecs[j]])
            labels.append(labels[j])
        else:
            li = rng.randrange(n_clusters)
            labels.append(li)
            # sigma 4.0 on fixed-norm centers puts within-cluster cosine
            # at ~0.06±0.1 (well below the 0.4 near-dup threshold): only
            # PLANTED dups and a thin tail are true pairs, matching the
            # driver testdata — tight clusters (sigma 0.35) made every
            # same-cluster pair a "duplicate", a quadratic output no real
            # dedup corpus has
            vecs.append(
                [x + rng.gauss(0.0, 4.0) for x in centers[li]]
            )
    out.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    vecs, pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        out,
        row_group_size=50_000,
    )
    return str(out)


def ensure_tables(sf: float, seed: int = SEED) -> str:
    """Documents + embeddings for one scale factor; returns the sf dir
    (the same directory ``transcripts.ensure_transcripts`` fills), so
    bench scripts can point SPARK_GRAFT-style sf_dir arguments at it."""
    ensure_documents(sf, seed)
    ensure_embeddings(sf, seed)
    return str(FIXTURE_ROOT / f"sf{sf:g}")


_ENTITY_LABELS = ["Person", "Organization", "Location"]
_ORG_SUFFIX = ["Corp", "Inc", "GmbH", "Ltd", "Group", "Labs"]


def entity_names(
    n: int = 100_000,
    cluster_fraction: float = 0.05,
    seed: int = SEED,
) -> list[tuple[int, str, str, int]]:
    """Deterministic high-cardinality entity inventory with planted
    near-duplicate clusters — the fixture the fuzzy-resolution LSH
    blocking is benched against (reference resolver.py:179-313 is
    all-pairs O(n²) at exactly this n).

    Returns ``(id, label, name, cluster_id)`` rows; ``cluster_id == -1``
    marks singletons.  ~``cluster_fraction`` of rows belong to planted
    clusters of 2-4 WRatio-near-duplicate variants of one base name
    (case flips, punctuation, suffix swaps, one-character typos, doubled
    whitespace — the edit classes real entity mentions exhibit), same
    label by construction (the resolver only merges within a label).
    Base names are drawn from the module's syllable vocabulary, so the
    cross-name 3-gram noise floor matches the documents corpus rather
    than colliding artificially.
    """
    rng = random.Random(seed * 7 + 13)

    def base_name(label: str) -> str:
        toks = [
            rng.choice(_VOCAB).capitalize()
            for _ in range(2 if label == "Person" else rng.choice([2, 3]))
        ]
        if label == "Organization":
            toks.append(rng.choice(_ORG_SUFFIX))
        return " ".join(toks)

    def variant(name: str) -> str:
        kind = rng.randrange(5)
        if kind == 0:  # case flip
            return name.upper() if rng.random() < 0.5 else name.lower()
        if kind == 1:  # punctuation
            return name.replace(" ", ", ", 1)
        if kind == 2:  # suffix swap / strip (orgs) or initial (persons)
            parts = name.split(" ")
            if parts[-1] in _ORG_SUFFIX:
                return " ".join(parts[:-1] + [rng.choice(_ORG_SUFFIX)])
            return " ".join(parts[:-1] + [parts[-1][0] + "."])
        if kind == 3:  # one-char typo (swap adjacent)
            i = rng.randrange(1, len(name) - 1)
            return name[: i - 1] + name[i] + name[i - 1] + name[i + 1:]
        return name.replace(" ", "  ", 1)  # doubled whitespace

    rows: list[tuple[int, str, str, int]] = []
    cluster_id = 0
    i = 0
    while i < n:
        label = _ENTITY_LABELS[i % 3]
        name = base_name(label)
        if rng.random() < cluster_fraction / 3.0 and i + 1 < n:
            size = min(rng.choice([2, 3, 4]), n - i)
            rows.append((i, label, name, cluster_id))
            for j in range(1, size):
                rows.append((i + j, label, variant(name), cluster_id))
            i += size
            cluster_id += 1
        else:
            rows.append((i, label, name, -1))
            i += 1
    return rows
