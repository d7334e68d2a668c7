"""Batch similarity kernels (numpy, Arrow-batch granularity).

jaro_winkler: fully vectorized over a batch of string pairs — strings
are packed into padded uint8 matrices and the greedy match phase loops
over character *positions* (<= max length, ~40) while staying
row-vectorized across the whole batch. No per-pair Python in the hot
path. Oracle: DuckDB's jaro_winkler_similarity (tests).

cosine_sparse: unit-normalized sparse dot via np.intersect1d on
pre-sorted index arrays.
"""

from __future__ import annotations

import numpy as np

_WINKLER_P = 0.1
_WINKLER_MAX_PREFIX = 4
_WINKLER_THRESHOLD = 0.7  # boost applied only when jaro > threshold


def _pack(strings: list[str], width: int) -> np.ndarray:
    buf = bytearray()
    for s in strings:
        b = s.encode("utf-8", errors="replace")[:width]
        buf += b + b"\x00" * (width - len(b))
    return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(len(strings), width)


def jaro(a: list[str], b: list[str]) -> np.ndarray:
    n = len(a)
    if n == 0:
        return np.zeros(0)
    la = np.array([len(s.encode("utf-8", errors="replace")) for s in a])
    lb = np.array([len(s.encode("utf-8", errors="replace")) for s in b])
    width = max(1, int(max(la.max(initial=0), lb.max(initial=0))))
    A = _pack(a, width)
    B = _pack(b, width)
    win = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    p_idx = np.arange(width)
    q_idx = np.arange(width)
    # eligibility mask: equal chars, both in-bounds, within window
    eq = A[:, :, None] == B[:, None, :]
    inb = (p_idx[None, :, None] < la[:, None, None]) & (
        q_idx[None, None, :] < lb[:, None, None]
    )
    dist_ok = (
        np.abs(p_idx[None, :, None] - q_idx[None, None, :]) <= win[:, None, None]
    )
    mask = eq & inb & dist_ok

    used = np.zeros((n, width), dtype=bool)
    match_q = np.full((n, width), -1, dtype=np.int64)
    rows = np.arange(n)
    for p in range(width):
        avail = mask[:, p, :] & ~used
        q = np.argmax(avail, axis=1)
        found = avail[rows, q]
        used[rows[found], q[found]] = True
        match_q[found, p] = q[found]

    m = (match_q >= 0).sum(axis=1)

    # transpositions: compare a-order matched b-positions to sorted order
    big = width + 1
    qa = np.where(match_q >= 0, match_q, big)
    qa_sorted_by_p = np.sort(
        np.where(match_q >= 0, np.arange(width)[None, :], big), axis=1
    )
    # b-positions in a-order: match_q at found p positions, left-packed
    order = np.argsort(np.where(match_q >= 0, np.arange(width)[None, :], big), axis=1)
    q_in_a_order = np.take_along_axis(match_q, order, axis=1)  # -1s at tail
    q_sorted = np.sort(qa, axis=1)  # big at tail
    valid = q_in_a_order >= 0
    cha = np.take_along_axis(
        np.concatenate([B, np.zeros((n, 1), np.uint8)], axis=1),
        np.where(valid, q_in_a_order, width),
        axis=1,
    )
    chb = np.take_along_axis(
        np.concatenate([B, np.zeros((n, 1), np.uint8)], axis=1),
        np.where(q_sorted <= width, np.minimum(q_sorted, width), width),
        axis=1,
    )
    t_half = ((cha != chb) & valid).sum(axis=1)
    t = t_half // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        mf = m.astype(np.float64)
        j = (mf / la + mf / lb + (mf - t) / np.where(mf == 0, 1, mf)) / 3.0
    # m == 0 (incl. either/both empty) -> 0.0, matching DuckDB's convention
    j = np.where(m == 0, 0.0, j)
    _ = qa_sorted_by_p  # (kept for clarity of derivation)
    return j


def jaro_winkler(a: list[str], b: list[str]) -> np.ndarray:
    j = jaro(a, b)
    n = len(a)
    if n == 0:
        return j
    width = _WINKLER_MAX_PREFIX
    A = _pack(a, width)
    B = _pack(b, width)
    neq = (A != B) | (A == 0)
    first_diff = np.argmax(neq, axis=1)
    all_eq = ~neq.any(axis=1)
    prefix = np.where(all_eq, width, first_diff)
    boosted = j + _WINKLER_P * prefix * (1.0 - j)
    return np.where(j > _WINKLER_THRESHOLD, boosted, j)


def cosine_sparse(
    a_idx: list[np.ndarray],
    a_val: list[np.ndarray],
    b_idx: list[np.ndarray],
    b_val: list[np.ndarray],
) -> np.ndarray:
    """Cosine of unit-normalized sparse vectors (sorted index arrays).
    Vectors are pre-normalized at transform time, so cos == sparse dot."""
    out = np.zeros(len(a_idx))
    for i in range(len(a_idx)):
        ai, bi = a_idx[i], b_idx[i]
        if ai is None or bi is None or len(ai) == 0 or len(bi) == 0:
            continue
        common, ca, cb = np.intersect1d(
            ai, bi, assume_unique=True, return_indices=True
        )
        if len(common):
            out[i] = float(np.dot(a_val[i][ca], b_val[i][cb]))
    return out


def cosine_dense(a: list, b: list) -> np.ndarray:
    """Cosine over dense arrays (topic vectors, embeddings)."""
    out = np.zeros(len(a))
    for i in range(len(a)):
        x, y = a[i], b[i]
        if x is None or y is None:
            continue
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        nx, ny = np.linalg.norm(x), np.linalg.norm(y)
        if nx > 0 and ny > 0:
            out[i] = float(np.dot(x, y) / (nx * ny))
    return out
