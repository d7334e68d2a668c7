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


def stable_id64(parts: list[str]) -> int:
    """Stable signed-64 id from string parts (used for mention ids)."""
    import hashlib

    h = hashlib.sha256("|".join(parts).encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big", signed=True)
