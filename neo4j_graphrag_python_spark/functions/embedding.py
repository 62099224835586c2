"""Deterministic hash embeddings (the test/bench Embedder).

Stands in for the reference's remote embedding providers
(reference: embeddings/base.py:20-35 ``Embedder.embed_query``) so the
pipeline is fully deterministic and network-free.  Real models plug in by
swapping :func:`embed_batch` for any ``list[str] -> np.ndarray`` callable in
the pandas-UDF factory (operators/embedder.py) — the Spark plumbing is
identical.

Design: hashing-trick bag-of-tokens — each token (plus its 2-shingles for a
little word-order signal) is murmur-ish hashed into one of ``dim`` buckets
with a ±1 sign; the vector is L2-normalized.  Identical texts ⇒ identical
vectors; cosine similarity correlates with token overlap, which is what the
semantic-resolver golden cases need ("Alice" vs "Alice" ⇒ 1.0; "Alice" vs
"Bob" ⇒ ≈0).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List

import numpy as np

DEFAULT_DIM = 64


def _token_bucket(token: str, dim: int) -> tuple[int, float]:
    h = int.from_bytes(
        hashlib.md5(token.encode("utf-8")).digest()[:8], "little"
    )
    return h % dim, 1.0 if (h >> 62) & 1 else -1.0


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    vec = np.zeros(dim, dtype=np.float64)
    tokens = text.lower().split()
    features: List[str] = list(tokens)
    features.extend(f"{a}_{b}" for a, b in zip(tokens, tokens[1:]))
    for tok in features:
        idx, sign = _token_bucket(tok, dim)
        vec[idx] += sign
    norm = float(np.linalg.norm(vec))
    if norm > 0:
        vec /= norm
    return vec


def embed_batch(texts: Iterable[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    """Vectorized entry point used by the pandas UDF (one Arrow batch)."""
    return np.stack([embed_text(t or "", dim) for t in texts])


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    if not na or not nb:
        return 0.0
    return float(np.dot(a, b) / (na * nb))
