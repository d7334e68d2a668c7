"""Pure-python union-find — the correctness oracle for the
large-star/small-star connected components (stdlib only)."""

from __future__ import annotations


class UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent.setdefault(x, x)
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id root convention, matching the Spark implementation
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """node -> min member id of its component."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {n: uf.find(n) for n in list(uf.parent)}
