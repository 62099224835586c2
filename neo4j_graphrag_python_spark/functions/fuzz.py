"""Fuzzy string similarity for entity resolution.

Mirrors the scoring contract of the reference ``FuzzyMatchResolver``
(reference: experimental/components/resolver.py:417-453):
``score = fuzz.WRatio(a, b, processor=utils.default_process) / 100``.

``rapidfuzz`` is not available in this environment, so we provide a
pure-Python stand-in:

* :func:`default_process` — lowercase, replace non-alphanumerics with
  spaces, collapse/strip — matches rapidfuzz.utils.default_process for the
  golden cases (``"  ALICE  "`` vs ``"alice!"`` → identical → 1.0;
  tests/unit/.../test_resolver.py:233-240).
* :func:`ratio` — InDel similarity (rapidfuzz ``fuzz.ratio`` definition:
  ``1 - distance/(len_a+len_b)``) via an exact LCS two-row DP (difflib's
  SequenceMatcher was tried first but its greedy matching is asymmetric —
  caught by hypothesis).
* :func:`wratio` — weighted combination approximating ``fuzz.WRatio``:
  full ratio and, for length-imbalanced pairs, a scaled partial ratio.

When ``rapidfuzz`` *is* importable we delegate to it, so cluster
deployments with the real dependency get identical-to-reference scores.
"""

from __future__ import annotations

import re

try:  # pragma: no cover - absent in this sandbox
    from rapidfuzz import fuzz as _rf_fuzz
    from rapidfuzz import utils as _rf_utils

    HAVE_RAPIDFUZZ = True
except ImportError:
    HAVE_RAPIDFUZZ = False

_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def default_process(s: str) -> str:
    return _NON_ALNUM.sub(" ", s.lower()).strip()


def _lcs_len(a: str, b: str) -> int:
    """Longest-common-subsequence length (two-row DP).

    O(len·len) per pair — inputs are LSH-blocked entity names, not
    documents.  difflib's SequenceMatcher was used here first and turned
    out to be greedy (longest-block recursion), which undercounts matches
    ASYMMETRICALLY — hypothesis found ratio(a,b) != ratio(b,a); InDel
    similarity is defined on the true LCS."""
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        append = cur.append
        for j, cb in enumerate(b, 1):
            if ca == cb:
                append(prev[j - 1] + 1)
            else:
                pj = prev[j]
                cj = cur[j - 1]
                append(pj if pj >= cj else cj)
        prev = cur
    return prev[-1]


def ratio(a: str, b: str) -> float:
    """InDel similarity in [0,1] (rapidfuzz fuzz.ratio definition):
    1 - indel_distance/(len(a)+len(b)) = 2*LCS/(len(a)+len(b))."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return 2.0 * _lcs_len(a, b) / (len(a) + len(b))


def _partial_ratio(shorter: str, longer: str) -> float:
    """Best ratio of ``shorter`` against any same-length window of ``longer``."""
    if not shorter:
        return 0.0
    best = 0.0
    window = len(shorter)
    for off in range(0, len(longer) - window + 1):
        best = max(best, ratio(shorter, longer[off : off + window]))
        if best == 1.0:
            break
    return best


def wratio(a: str, b: str) -> float:
    """Approximation of rapidfuzz ``fuzz.WRatio`` (already processed input),
    scaled to [0,1]."""
    if not a or not b:
        return 0.0
    base = ratio(a, b)
    len_ratio = max(len(a), len(b)) / min(len(a), len(b))
    if len_ratio < 1.5:
        return base
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    scale = 0.6 if len_ratio >= 8 else 0.9
    return max(base, _partial_ratio(shorter, longer) * scale)


def similarity(text_a: str, text_b: str) -> float:
    """Reference FuzzyMatchResolver.compute_similarity (resolver.py:448-453)."""
    if HAVE_RAPIDFUZZ:  # pragma: no cover
        return float(
            _rf_fuzz.WRatio(text_a, text_b, processor=_rf_utils.default_process)
            / 100.0
        )
    return wratio(default_process(text_a), default_process(text_b))
