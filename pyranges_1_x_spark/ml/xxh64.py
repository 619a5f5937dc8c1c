"""Spark-exact xxHash64 in pure Python (+ a numpy-vectorized seeded step).

Spark's ``F.xxhash64(col, ...)`` (catalyst XxHash64 / XXH64.java) folds its
arguments: ``hash = 42``; for each argument ``hash = computeHash(arg, hash)``
where a string hashes its UTF-8 bytes with XXH64 and an int literal goes
through the specialized 4-byte ``hashInt``. DuckDB has no xxhash64 at all,
which left the ``minhash_lsh`` registry row rows-only for two rounds
(CORRECTNESS r6/r7 ``no_oracle``). This module is the exact twin the DuckDB
oracle needs:

* ``xxh64(data, seed)`` — standard XXH64 over bytes (unsigned result);
* ``spark_xxhash64_str(s)`` — ``F.xxhash64(s)`` for a string column
  (seed 42, signed int64 result like Spark);
* ``hash_int_seeded(seeds, base)`` — numpy-vectorized
  ``XXH64.hashInt(seed_i, base_hash)``, the per-seed MinHash step: Spark's
  ``xxhash64(s, lit(i)) == hashInt(i, xxhash64_bytes(utf8(s), 42))``, so the
  expensive string pass runs ONCE per shingle and the K seeded variants are
  five integer ops each.

Exactness is pinned by ``tests/test_ml_and_seqs.py`` comparing every helper
against a live ``F.xxhash64`` projection over random unicode strings.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 over ``data`` with ``seed``; unsigned 64-bit result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (_rotl((v + k * _P2) & _M, 31) * _P1) & _M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_str(s: str) -> int:
    """``F.xxhash64(string_col)``: XXH64 of the UTF-8 bytes, seed 42, signed."""
    return _signed(xxh64(s.encode("utf-8"), 42))


def hash_int_py(value: int, seed: int) -> int:
    """``XXH64.hashInt`` (the 4-byte specialization Spark uses for an int
    argument); ``seed`` is the running fold hash, unsigned in/out."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def spark_xxhash64_str_seeded(s: str, seed_lit: int) -> int:
    """``F.xxhash64(string_col, lit(seed_lit))``: the fold — the int literal
    hashes with the string's hash as its seed. Signed result."""
    return _signed(hash_int_py(seed_lit, xxh64(s.encode("utf-8"), 42)))


def hash_int_seeded(seed_lits: np.ndarray, base: np.ndarray) -> np.ndarray:
    """Vectorized ``hashInt(seed_lit, base_unsigned)`` over numpy arrays;
    ``base`` is the SIGNED int64 string hash (as surfaced to SQL), returns
    signed int64. uint64 arithmetic wraps in C semantics, which is exactly
    the mod-2^64 the algorithm needs."""
    with np.errstate(over="ignore"):
        h = base.astype(np.int64).view(np.uint64) + np.uint64((_P5 + 4) & _M)
        h ^= (seed_lits.astype(np.uint64) & np.uint64(0xFFFFFFFF)) * np.uint64(_P1)
        h = ((h << np.uint64(23)) | (h >> np.uint64(41))) * np.uint64(_P2) + np.uint64(_P3)
        h ^= h >> np.uint64(33)
        h *= np.uint64(_P2)
        h ^= h >> np.uint64(29)
        h *= np.uint64(_P3)
        h ^= h >> np.uint64(32)
    return h.view(np.int64)
