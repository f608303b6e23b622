#!/usr/bin/env python3
"""Simulate graph_coreness BEFORE any Spark code (the rule-11 sim-first
discipline; judge r12 item #2): full per-vertex core numbers on the
derived Zipf tier. Two candidate formulations are measured against each
other:

1. LEVELED PEEL (k = 1, 2, ... each to synchronous fixpoint, vertices
   dropped at level k get coreness k-1) — oracle depth would be the SUM
   of per-level cascade rounds (a nested unroll).
2. H-INDEX ITERATION (Lu-Chen-Zhou, "The H-index of a network node and
   its relation to degree and coreness", Nat. Commun. 2016):
   h_0 = degree, h_{r+1}(v) = H({h_r(u) : u in N(v)}) — pointwise
   monotone NON-INCREASING from the degree init and convergent to the
   exact coreness, so the oracle is ONE flat synchronous unroll and the
   engine's convergence probe can be the (strictly decreasing until
   fixpoint) integer sum(h).

Prints per SF: |V| |E|, degeneracy (max coreness), coreness histogram,
per-level peel rounds and their sum, h-index rounds to fixpoint
(including the confirming no-change round), and asserts peel == h-index
exactly.

Usage: python3 tools/sim_coreness.py /root/testdata/sf0.001 [...]
"""
import sys
from sim_mst import zipf_edges


def adj_of(edges, verts):
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def coreness_peel(adj, verts):
    alive = set(verts)
    deg = {v: len(adj[v]) for v in verts}
    core = {}
    k = 1
    level_rounds = []
    while alive:
        r = 0
        while True:
            drop = [v for v in alive if deg[v] < k]
            if not drop:
                break
            r += 1
            for v in drop:
                alive.discard(v)
                core[v] = k - 1
                for u in adj[v]:
                    if u in alive:
                        deg[u] -= 1
        level_rounds.append(r)
        k += 1
    return core, level_rounds


def hindex(vals_desc):
    h = 0
    for i, x in enumerate(vals_desc, 1):
        m = i if i < x else x
        if m > h:
            h = m
    return h


def coreness_hindex(adj, verts):
    h = {v: len(adj[v]) for v in verts}
    r = 0
    while True:
        r += 1
        nh = {v: hindex(sorted((h[u] for u in adj[v]), reverse=True))
              for v in verts}
        # monotone check: every step non-increasing (the sum-probe premise)
        assert all(nh[v] <= h[v] for v in verts), "h-index not monotone!"
        if nh == h:
            break
        h = nh
    return h, r


for d in sys.argv[1:]:
    es = zipf_edges(d)
    verts = sorted({x for e in es for x in e})
    adj = adj_of(es, verts)
    core, lv = coreness_peel(adj, verts)
    hx, rounds = coreness_hindex(adj, verts)
    assert core == hx, f"{d}: peel != h-index"
    hist = {}
    for c in core.values():
        hist[c] = hist.get(c, 0) + 1
    print(f"{d}: |V|={len(verts)} |E|={len(es)} degeneracy={max(core.values())} "
          f"hist={sorted(hist.items())} peel_levels={lv} sum={sum(lv)} "
          f"hindex_rounds={rounds}")
