"""Pure-Python XXH64 — bit-compatible with Spark's ``xxhash64``.

Spark's ``F.xxhash64(col, ...)`` (catalyst XXH64 expression) is the
public-domain xxHash64 algorithm (Yann Collet), chained across arguments:
the running hash of argument *i* becomes the seed for argument *i+1*,
starting from seed 42.  Strings hash their UTF-8 bytes; INT literals hash
as 4 little-endian bytes; LONGs as 8.

This module exists so offline oracle fixtures can replicate MinHash
signatures computed distributedly with ``F.xxhash64`` — the same
shared-deterministic-scalar pattern as ``simhash64`` and
``winnow_fingerprints``.  Parity with the JVM implementation is asserted
in tests/test_dedup.py over strings of every tail-length class (0-7
residual bytes) and chained int seeds.

Only stdlib; everything mod 2**64, output converted to Spark's signed
long range.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Standard XXH64 of ``data`` with ``seed`` (unsigned result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _avalanche(h)


def _to_signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


class Long:
    """Marks an argument as a Spark LongType COLUMN value (8 LE bytes),
    as opposed to a bare Python int, which spark_xxhash64 treats as the
    INT literal (4 LE bytes) that ``F.lit(python_int)`` produces.  Needed
    by the minhash long-rehash scheme: ``F.xxhash64(hash_col, F.lit(j))``
    chains [long column, int literal]."""

    __slots__ = ("v",)

    def __init__(self, v: int) -> None:
        self.v = int(v)


def spark_xxhash64(*args, seed: int = 42) -> int:
    """Replicates ``F.xxhash64(arg0, arg1, ...)``: the running hash seeds
    the next argument's hash.  ``str`` hashes UTF-8 bytes; ``int`` args
    are treated as Spark INT literals (4 LE bytes) — which is what
    ``F.lit(python_int)`` produces for values in int32 range; wrap a
    value in :class:`Long` for LongType-column semantics (8 LE bytes).
    Returns a SIGNED 64-bit value like Spark's LongType."""
    h = seed & _M
    for a in args:
        if isinstance(a, Long):
            h = xxh64(a.v.to_bytes(8, "little", signed=True), h)
        elif isinstance(a, str):
            h = xxh64(a.encode("utf-8"), h)
        elif isinstance(a, int):
            h = xxh64(int(a).to_bytes(4, "little", signed=True), h)
        else:
            raise TypeError(f"unsupported arg type {type(a).__name__}")
    return _to_signed(h)
