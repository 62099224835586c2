"""Deterministic synthetic transcripts — the pipeline's input fixture.

BASELINE.json input_hint: an Iceberg/parquet table
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)`` of multi-turn conversation / agent transcripts.  No external
data: this module synthesizes it, seeded, at any scale.

Design constraints (FIXTURES.md §1, §4):
  * row order in files is deliberately shuffled → correctness downstream
    depends on explicit ``orderBy(conv_id, turn_idx)``;
  * conversation lengths are skewed (a few very long convs) to exercise the
    salted repartition before extraction;
  * turn texts embed planted entity sentences drawn from seeded pools —
    ``"<P> works for <O>."``, ``"<O> is located in <L>."``,
    ``"<P1> knows <P2>."`` — so the expected (subj, pred, obj) set is exactly
    computable, by this module *and* by a regex in DuckDB (the oracle);
  * includes empty texts, a no-whitespace run, and lowercase-unicode filler.

Sentence grammar invariants the extractor/oracle rely on:
  * entity names are capitalized words ``[A-Z][A-Za-z]*`` joined by single
    spaces; filler text is entirely lowercase → no false positives;
  * every planted sentence is < 90 chars and ends with ``.``;
  * with the demo splitter config (chunk_size=600, overlap=200,
    approximate=True) every sentence is fully contained in at least one
    chunk, so the distinct-triple set from chunked extraction equals the
    distinct-triple set from per-turn extraction (the DuckDB oracle).
"""

from __future__ import annotations

import datetime as dt
import random
from pathlib import Path
from typing import Iterator

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260816

PERSONS = [
    "Alice",
    "Bob",
    "Carol",
    "Dave",
    "Eve",
    "Frank",
    "Grace",
    "Heidi",
    "Ivan",
    "Judy",
    "Mallory",
    "Olivia",
    "Peggy",
    "Trent",
    "John Smith",
    "Jon Smith",
]

ORGS = [
    "Acme Corp",
    "Globex",
    "Initech",
    "Umbrella Corp",
    "Stark Industries",
    "Wayne Enterprises",
    "Hooli",
    "Vandelay Industries",
    "Soylent Corp",
    "Tyrell Corp",
]

LOCATIONS = [
    "Paris",
    "Berlin",
    "London",
    "Tokyo",
    "Oslo",
    "Madrid",
    "Zurich",
    "Austin",
    "Nairobi",
    "Lima",
]

_FILLERS = [
    "the batch job finished without warnings and the logs look clean.",
    "let me check the config file and rerun the failing step.",
    "ok, i will look into the retry logic for the queue consumer.",
    "the naïve café résumé test passed on the second attempt.",
    "1234567890",
    "here is the summary of what we discussed earlier today.",
    "that matches what the dashboard shows for the last hour.",
    "sounds good, please proceed with the rollout as planned.",
    "",
]

_TOOLS = ["search", "calculator", "sql_runner", "browser"]

ROLES = ["user", "assistant", "tool"]

# Regexes shared (verbatim) by the deterministic extractor and the DuckDB
# oracle SQL.  RE2-safe: no lookaround/backrefs; greedy leftmost semantics
# identical between Python `re` and DuckDB.
#
# SENT_PREFIX anchors a match to a sentence start (string start, newline =
# turn boundary, or '. ').  Without it, a chunk starting mid-name
# ("…Wayne| Enterprises is located in Tokyo.") would extract a truncated
# subject; the splitter's 2-char boundary context (operators/splitter.py)
# plus this prefix removes chunk-boundary false positives entirely.
# The generator plants at most ONE entity sentence per turn, in first
# position, so the consuming (non-lookbehind) prefix never interacts with a
# same-predicate neighbor — keeping Python finditer and DuckDB
# regexp_extract_all results identical.
NAME = r"[A-Z][A-Za-z]*(?: [A-Z][A-Za-z]*)*"
SENT_PREFIX = r"(?:^|\n|\. )"
PATTERNS = {
    "WORKS_FOR": (
        rf"{SENT_PREFIX}({NAME}) works for ({NAME})\.",
        "Person",
        "Organization",
    ),
    "LOCATED_IN": (
        rf"{SENT_PREFIX}({NAME}) is located in ({NAME})\.",
        "Organization",
        "Location",
    ),
    "KNOWS": (rf"{SENT_PREFIX}({NAME}) knows ({NAME})\.", "Person", "Person"),
}


def n_convs_for_sf(sf: float) -> int:
    return max(20, int(round(sf * 200_000)))


def sf_from_dir(sf_dir: str) -> float:
    """Parse '.../sf0.01' → 0.01."""
    name = Path(sf_dir).name
    if not name.startswith("sf"):
        raise ValueError(f"not an sf dir: {sf_dir}")
    return float(name[2:])


def _conv_sentences(rng: random.Random) -> str:
    """1-3 sentences; at most one planted entity sentence, always first
    (see SENT_PREFIX consistency note above)."""
    parts = []
    kind = rng.random()
    if kind < 0.18:
        parts.append(f"{rng.choice(PERSONS)} works for {rng.choice(ORGS)}.")
    elif kind < 0.30:
        parts.append(
            f"{rng.choice(ORGS)} is located in {rng.choice(LOCATIONS)}."
        )
    elif kind < 0.42:
        p1 = rng.choice(PERSONS)
        p2 = rng.choice([p for p in PERSONS if p != p1])
        parts.append(f"{p1} knows {p2}.")
    for _ in range(rng.randint(0, 2)):
        parts.append(rng.choice(_FILLERS))
    return " ".join(p for p in parts if p)


def generate_rows(
    sf: float, seed: int = SEED
) -> Iterator[tuple[str, int, str, str, str | None, dt.datetime]]:
    """Yield transcript rows (unshuffled; caller shuffles)."""
    rng = random.Random(seed)
    base_ts = dt.datetime(2025, 1, 1, 0, 0, 0)
    n_convs = n_convs_for_sf(sf)
    for ci in range(n_convs):
        conv_id = f"conv{ci:07d}"
        if ci % 997 == 0:
            n_turns = rng.randint(300, 600)  # skewed long conversations
        else:
            n_turns = rng.randint(4, 24)
        for ti in range(n_turns):
            role = ROLES[ti % 3]
            tool = rng.choice(_TOOLS) if role == "tool" else None
            if role == "tool":
                text = (
                    '{"status": "ok", "rows": %d}' % rng.randint(0, 999)
                    if rng.random() < 0.7
                    else _conv_sentences(rng)
                )
            else:
                text = _conv_sentences(rng)
            ts = base_ts + dt.timedelta(minutes=ti, seconds=ci % 3600)
            yield (conv_id, ti, role, text, tool, ts)


def write_transcripts(path: str | Path, sf: float, seed: int = SEED) -> Path:
    """Materialize the fixture parquet (rows shuffled on purpose)."""
    rows = list(generate_rows(sf, seed))
    random.Random(seed + 1).shuffle(rows)
    conv_id, turn_idx, role, text, tool, ts = zip(*rows)
    table = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.parquet")
    # small row groups: Spark parallelizes parquet scans at row-group
    # granularity — one fat row group would serialize the whole read
    pq.write_table(table, tmp, row_group_size=50_000)
    tmp.replace(path)
    return path


FIXTURE_ROOT = Path(__file__).resolve().parent.parent / ".fixtures"


def ensure_transcripts(sf_dir: str, seed: int = SEED) -> str:
    """Idempotently materialize the transcripts fixture matching a testdata
    sf dir (e.g. '/root/testdata/sf0.01' → .fixtures/sf0.01/transcripts.parquet)."""
    sf = sf_from_dir(sf_dir)
    out = FIXTURE_ROOT / Path(sf_dir).name / "transcripts.parquet"
    if not out.exists():
        write_transcripts(out, sf, seed)
    return str(out)


def expected_triples(sf: float, seed: int = SEED) -> set[tuple[str, str, str]]:
    """Ground-truth distinct (subj, pred, obj) set, computed per-turn.

    This is what the chunk-level pipeline must reproduce (P/R target 1.0 ≥
    the 0.95 gate) — chunk overlap guarantees no sentence is lost (module
    docstring invariant).
    """
    import re

    compiled = {
        pred: re.compile(pattern) for pred, (pattern, _, _) in PATTERNS.items()
    }
    out: set[tuple[str, str, str]] = set()
    for _, _, _, text, _, _ in generate_rows(sf, seed):
        for pred, rx in compiled.items():
            for m in rx.finditer(text):
                out.add((m.group(1), pred, m.group(2)))
    return out
