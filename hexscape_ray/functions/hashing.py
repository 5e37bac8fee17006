"""Deterministic hashing primitives (no wall-clock, no RNG state).

Used for: url geocoding, exact dedup keys, MinHash permutations,
SimHash, salting hot keys, and the doc_id -> synthetic coordinate map
that the DuckDB oracle reproduces in SQL.
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
# second FNV family (different offset basis, same prime): an
# independent 64-bit content hash for 128-bit keys — two strings that
# collide in family 1 almost surely differ in family 2 (used by
# duplicate_spans to carry a 128-bit gram id instead of the gram text)
_FNV_OFFSET2 = np.uint64(0xAF63BD4C8601B7DF)

# Knuth multiplicative constants — also used verbatim in oracle SQL.
MULT_A = 2654435761
MULT_B = 2246822519
MOD32 = 4294967296


def fnv1a_64(data: bytes) -> int:
    """FNV-1a 64-bit over bytes (scalar; per-row in batch loops)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a_64_str_array(strings) -> np.ndarray:
    """uint64 FNV-1a per string.  Python loop over rows but each hash is
    C-speed enough for key derivation on dedup/geocode stages; hot paths
    should hash once and reuse the column."""
    return np.fromiter(
        (fnv1a_64(s.encode("utf-8") if isinstance(s, str) else bytes(s)) for s in strings),
        dtype=np.uint64,
        count=len(strings),
    )


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorised splitmix64 finaliser — derives independent hash
    families from one base hash (MinHash permutations, salts)."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D1B2C31E8C671D)
        z = z ^ (z >> np.uint64(31))
    return z


def hash_combine(h: np.ndarray, seed: int) -> np.ndarray:
    """Mix a seed into an array of uint64 hashes."""
    return splitmix64(np.asarray(h, dtype=np.uint64) ^ np.uint64(seed))


def knuth_frac(keys: np.ndarray, mult: int) -> np.ndarray:
    """``((key * mult) % 2^32) / 2^32`` as float64 — bit-identical to the
    SQL expression ``((key * mult) % 4294967296) / 4294967296.0`` which
    the DuckDB oracle uses (integer ops are exact in both engines)."""
    k = np.asarray(keys, dtype=np.uint64)
    with np.errstate(over="ignore"):
        v = (k * np.uint64(mult)) % np.uint64(MOD32)
    return v.astype(np.float64) / float(MOD32)


def fnv1a_64_ranges(
    data: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    offset: np.uint64 = _FNV_OFFSET,
) -> np.ndarray:
    """Vectorised FNV-1a 64 over byte RANGES of one shared uint8 buffer
    — bit-identical to :func:`fnv1a_64` on ``bytes(data[s:e])`` per row
    (at the default ``offset``; pass ``_FNV_OFFSET2`` for the second
    independent family of a 128-bit key).

    One numpy pass per byte POSITION (gather + xor + multiply on the
    still-active rows), so total work is Σ lens elementwise ops instead
    of a Python loop per byte; uint64 multiply has no SIMD path but its
    scalar C throughput still beats the interpreter ~100×.  This is the
    hot-path hasher for geocoding a string column straight from its
    Arrow buffers.
    """
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    n = starts.size
    h = np.full(n, offset, dtype=np.uint64)
    if n == 0:
        return h
    lens = ends - starts
    maxlen = int(lens.max()) if lens.size else 0
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            b = data[starts[active] + j].astype(np.uint64)
            h[active] = (h[active] ^ b) * _FNV_PRIME
    return h


def fnv1a_128_str_array(strings) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 FNV-1a families per string — a 128-bit
    content key.  Vectorised: the strings are packed once into an Arrow
    string array and both families run :func:`fnv1a_64_ranges` over its
    shared utf-8 buffer (no per-string Python hashing).  Family 1 is
    bit-identical to :func:`fnv1a_64_str_array`.  Collision probability
    for n distinct strings is ~n²/2^129 — negligible at any corpus
    scale, which is what lets ``duplicate_spans`` ship a 16-byte gram id
    through its shuffle instead of the gram text."""
    import pyarrow as pa

    arr = (
        strings
        if isinstance(strings, pa.Array)
        else pa.array(strings, type=pa.string())
    )
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32).astype(np.int64)
    offs = offs[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    h1 = fnv1a_64_ranges(data, offs[:-1], offs[1:])
    h2 = fnv1a_64_ranges(data, offs[:-1], offs[1:], offset=_FNV_OFFSET2)
    return h1, h2


def _first_match_per_row(pos: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Given ascending byte positions of matches and row offsets, return
    (rows, first_pos_in_row) — one entry per row that has ≥1 match."""
    rows = np.searchsorted(offsets, pos, side="right") - 1
    keep_rows, first_idx = np.unique(rows, return_index=True)
    return keep_rows, pos[first_idx]


def host_ranges(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Byte ranges [start, end) of the HOST inside each utf-8 url row of
    a shared buffer — the vectorised twin of ``geocode.host_of``
    (first '://' then the next '/'; ASCII delimiters are unambiguous in
    utf-8, so byte search == character search).
    """
    n = offsets.size - 1
    starts = offsets[:-1].astype(np.int64).copy()
    ends = offsets[1:].astype(np.int64).copy()
    if data.size >= 3:
        m = (data[:-2] == 0x3A) & (data[1:-1] == 0x2F) & (data[2:] == 0x2F)
        pos = np.flatnonzero(m)
        rows = np.searchsorted(offsets, pos, side="right") - 1
        ok = pos + 3 <= ends[rows]  # '://' fully inside its row
        keep_rows, first = _first_match_per_row(pos[ok], offsets)
        starts[keep_rows] = first + 3
    slash = np.flatnonzero(data == 0x2F)
    rows = np.searchsorted(offsets, slash, side="right") - 1
    ok = slash >= starts[rows]  # only separators at/after the host start
    keep_rows, first = _first_match_per_row(slash[ok], offsets)
    ends[keep_rows] = first
    return starts, ends
