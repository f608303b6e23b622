#!/usr/bin/env python3
"""Simulate graph_trussness BEFORE any Spark code (rule-11 discipline;
judge r13 item #3 — the per-edge completion of X114's leveled summary,
the way r13's graph_coreness completed the vertex peel).

Two computations over the derived Zipf tier:
(a) ground truth: Cohen's support peel — repeatedly delete the edge of
    minimum support, recording trussness(e) = k when e is deleted while
    the threshold is k (exact sequential decomposition);
(b) the candidate engine formulation: the LOCALLY-ITERATIVE H-INDEX on
    edges (Sariyuce-Seshadhri-Pinar local nucleus decomposition /
    Lu-Chen-Zhou h-index family, public): h(e) init = support(e); per
    synchronous round h(e) <- H({min(h(f), h(g)) : triangles {e,f,g}}),
    H = max i s.t. at least i values >= i (the same max(min(rank, val))
    formula graph_coreness runs). Monotone non-increasing => integer-sum
    convergence probe; claims h(e) + 2 == trussness(e).

Asserts (a) == (b)+2 at every SF and prints the synchronous depth (the
oracle unroll bound — rule 38: this formulation has a FLAT oracle,
one unroll, unlike the peel whose unroll is the sum of per-level
cascades).

Usage: python3 tools/sim_trussness.py <sfdir> [...]
"""
import sys
from sim_mst import zipf_edges


def triangles(es):
    """Oriented enumeration: triangles as canonical edge triples."""
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(s) for v, s in adj.items()}

    def key(v):
        return (deg[v], v)
    tris = []
    for a, b in es:
        # enumerate at the lowest-(deg,id) vertex of each edge
        s, t = (a, b) if key(a) < key(b) else (b, a)
        for w in adj[s]:
            if key(w) > key(t) and w in adj[t]:
                e1 = (min(s, t), max(s, t))
                e2 = (min(s, w), max(s, w))
                e3 = (min(t, w), max(t, w))
                tris.append((e1, e2, e3))
    return tris


def peel_trussness(es, tris):
    """Exact sequential min-support peel (Cohen's k-truss) with a lazy
    heap (trussness values are independent of the tie order among
    equal-support edges, so stale heap entries are simply skipped)."""
    import heapq
    sup = {e: 0 for e in es}
    tri_of = {e: [] for e in es}
    for t in tris:
        for i in range(3):
            sup[t[i]] += 1
            tri_of[t[i]].append(t)
    heap = [(s, e) for e, s in sup.items()]
    heapq.heapify(heap)
    alive = set(es)
    truss = {}
    k = 2
    while heap:
        s, e = heapq.heappop(heap)
        if e not in alive or s != sup[e]:
            continue  # stale entry
        if s > k - 2:
            k = s + 2
        truss[e] = k
        alive.discard(e)
        for t in tri_of[e]:
            if all(x == e or x in alive for x in t):
                for x in t:
                    if x != e and sup[x] > s:
                        sup[x] -= 1
                        heapq.heappush(heap, (sup[x], x))
    return truss


def hindex_trussness(es, tris):
    """Synchronous edge h-index iteration; returns (h, rounds)."""
    h = {e: 0 for e in es}
    by_edge = {}
    for (e1, e2, e3) in tris:
        h[e1] += 1
        h[e2] += 1
        h[e3] += 1
        by_edge.setdefault(e1, []).append((e2, e3))
        by_edge.setdefault(e2, []).append((e1, e3))
        by_edge.setdefault(e3, []).append((e1, e2))
    r = 0
    while True:
        r += 1
        nxt = {}
        for e in h:
            vals = sorted((min(h[f], h[g]) for f, g in
                           by_edge.get(e, ())), reverse=True)
            best = 0
            for i, v in enumerate(vals):
                best = max(best, min(i + 1, v))
            nxt[e] = best
        # monotone non-increasing from the support init — the engine's
        # integer-sum convergence probe depends on it
        assert all(nxt[e] <= h[e] for e in h), "h-index not monotone"
        if nxt == h:
            return h, r - 1  # last round was the no-op probe
        h = nxt


for d in sys.argv[1:]:
    es = sorted(set(zipf_edges(d)))
    tris = triangles(es)
    truss = peel_trussness(es, tris)
    h, rounds = hindex_trussness(es, tris)
    ok = all(truss[e] == h[e] + 2 for e in es)
    from collections import Counter
    hist = Counter(truss.values())
    print(f"{d}: |E|={len(es)} |tri|={len(tris)} depth={rounds} "
          f"peel==h+2: {ok} hist={dict(sorted(hist.items()))}")
    assert ok
