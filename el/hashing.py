"""Deterministic vectorized hashing utilities (numpy, no RNG state).

Everything derived from page/mention ids goes through these so results
are a pure function of (id, seed) — independent of partitioning,
parallelism, and row order (SURVEY.md §4.4 determinism discipline).
"""

from __future__ import annotations

import numpy as np

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays (wraparound
    arithmetic is intentional)."""
    with np.errstate(over="ignore"):
        z = (x + _GOLD).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def h64(ids: np.ndarray, salt: int, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash stream keyed by (id, salt, seed)."""
    k = np.array(
        [(salt * 0x632BE59B + seed * 0x85EBCA6B) & 0xFFFFFFFFFFFFFFFF],
        dtype=np.uint64,
    )
    x = ids.astype(np.uint64) ^ splitmix64(k)[0]
    return splitmix64(x)


def u01(ids: np.ndarray, salt: int, seed: int = 0) -> np.ndarray:
    """Deterministic uniform [0,1) per id."""
    return h64(ids, salt, seed).astype(np.float64) / 18446744073709551616.0


def hchoice(ids: np.ndarray, n: int, salt: int, seed: int = 0) -> np.ndarray:
    """Deterministic choice in [0, n) per id."""
    return (h64(ids, salt, seed) % np.uint64(max(n, 1))).astype(np.int64)


_FNV32_OFFSET = 2166136261
_FNV32_PRIME = 16777619
_FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)


def fnv1a_tokens(tokens: list[str], bits: int = 64) -> np.ndarray:
    """Vectorized FNV-1a over a batch of short strings -> uint64 array
    (low 32 bits populated when ``bits == 32``).

    Bit-identical to the per-char scalar loop over each token's UTF-8
    bytes, but computed column-wise: all tokens' bytes are flattened
    into one buffer and the hash state of every token advances one
    byte position per pass (``max_len`` vectorized passes total —
    tokens are words, so max_len is tiny while the batch is large).
    """
    n = len(tokens)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    try:  # fast path: tokenizers upstream emit [a-z0-9]+ (pure ASCII)
        flat = np.frombuffer("".join(tokens).encode("ascii"), dtype=np.uint8)
        lens = np.fromiter(map(len, tokens), dtype=np.int64, count=n)
    except UnicodeEncodeError:
        encs = [t.encode("utf-8") for t in tokens]
        flat = np.frombuffer(b"".join(encs), dtype=np.uint8)
        lens = np.fromiter(map(len, encs), dtype=np.int64, count=n)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    if bits == 32:
        # 32-bit state in uint64 registers: (h ^ b) * prime < 2^56, so
        # a single mask after the multiply suffices (no wraparound)
        h = np.full(n, _FNV32_OFFSET, dtype=np.uint64)
        prime = np.uint64(_FNV32_PRIME)
        mask32 = np.uint64(0xFFFFFFFF)
        for p in range(int(lens.max())):
            alive = np.flatnonzero(lens > p)
            if alive.size == 0:
                break
            b = flat[starts[alive] + p].astype(np.uint64)
            h[alive] = ((h[alive] ^ b) * prime) & mask32
        return h
    h = np.full(n, _FNV64_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for p in range(int(lens.max())):
            alive = np.flatnonzero(lens > p)
            if alive.size == 0:
                break
            b = flat[starts[alive] + p].astype(np.uint64)
            h[alive] = (h[alive] ^ b) * _FNV64_PRIME
    return h


def stable_id64(parts: list[str]) -> int:
    """Stable signed-64 id from string parts (used for mention ids)."""
    import hashlib

    h = hashlib.sha256("|".join(parts).encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big", signed=True)
