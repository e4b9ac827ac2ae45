"""Trusted pure-Python oracles for the graph algorithms (SURVEY.md SS7:
golden-output strategy mirroring the reference's expected/part-* files,
with a NumPy/pure-Python reference implementation instead of committed
golden text)."""

from __future__ import annotations

from collections import Counter, defaultdict


def pagerank_oracle(
    adj: dict[int, list[int]],
    vertices: set[int],
    updates: int | None = None,
    tol: float | None = None,
    damping: float = 0.85,
    max_updates: int = 500,
) -> dict[int, float]:
    """Reference semantics: teleport (1-d)/N, dangling mass dropped."""
    n = len(vertices)
    r = {v: 1.0 / n for v in vertices}
    k = 0
    while True:
        new = {v: (1.0 - damping) / n for v in vertices}
        for u, ds in adj.items():
            if not ds:
                continue
            w = r[u] / len(ds)
            for d in ds:
                new[d] += damping * w
        delta = sum(abs(new[v] - r[v]) for v in vertices)
        r = new
        k += 1
        if updates is not None and k >= updates:
            return r
        if tol is not None and delta <= tol:
            return r
        if k >= max_updates:
            return r


def cc_oracle(edges: list[tuple[int, int]], vertices: set[int]) -> dict[int, int]:
    """True connected components (undirected) — min id per component."""
    nbrs = defaultdict(set)
    for s, d in edges:
        nbrs[s].add(d)
        nbrs[d].add(s)
    label = {}
    for v in sorted(vertices):
        if v in label:
            continue
        stack, comp = [v], []
        seen = {v}
        while stack:
            u = stack.pop()
            comp.append(u)
            for w in nbrs[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        m = min(comp)
        for u in comp:
            label[u] = m
    return label


def lpa_oracle(
    edges: list[tuple[int, int]], vertices: set[int], max_supersteps: int = 20
) -> dict[int, int]:
    """Synchronous mode-label propagation, tie-break (count desc, label
    asc), isolated vertices keep their label. Matches lpa.py exactly."""
    nbrs = defaultdict(set)
    for s, d in edges:
        nbrs[s].add(d)
        nbrs[d].add(s)
    lbl = {v: v for v in vertices}
    for _ in range(max_supersteps):
        new = {}
        for v in vertices:
            if not nbrs[v]:
                new[v] = lbl[v]
                continue
            cnt = Counter(lbl[u] for u in nbrs[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == lbl:
            return new
        lbl = new
    return lbl


def triangles_oracle(
    edges: list[tuple[int, int]], vertices: set[int]
) -> dict[int, int]:
    """Undirected triangle count attributed to the smallest vertex."""
    nbrs = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    out = {v: 0 for v in vertices}
    for b in vertices:
        for a in nbrs[b]:
            for c in nbrs[b]:
                if a < b < c and c in nbrs[a]:
                    out[a] += 1
    return out


def sssp_oracle(
    edges: list[tuple[int, int]], vertices: set[int], source: int
) -> dict[int, float | None]:
    from heapq import heappop, heappush

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append((d, 1.0))
    dist = {v: None for v in vertices}
    pq = [(0.0, source)]
    while pq:
        du, u = heappop(pq)
        if dist[u] is not None and dist[u] <= du:
            continue
        dist[u] = du
        for w, c in adj[u]:
            if dist[w] is None or du + c < dist[w]:
                heappush(pq, (du + c, w))
    return dist
