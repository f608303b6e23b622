#!/usr/bin/env python3
"""Simulate graph_densest_subgraph (Bahmani 2(1+eps)-approx peeling,
eps=0 variant: peel deg <= 2*E/V per round) and graph_matching
(Hoepman local-max mutual-pick matching with strict packed weights)
on the Zipf tier BEFORE any Spark code.

Usage: python3 tools/sim_densest_match.py <sfdir> [...]
"""
import sys
from fractions import Fraction
from sim_mst import zipf_edges, string_hash


def densest(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    live = {v: set(n) for v, n in adj.items()}
    ne = len(edges)
    best = Fraction(ne, len(live))
    best_round = 0
    r = 0
    trace = []
    while ne > 0:
        r += 1
        nv = len(live)
        # peel deg*V <= 2*E (integer compare, no division)
        peel = [v for v, n in live.items() if len(n) * nv <= 2 * ne]
        if not peel:
            raise RuntimeError("no peel")  # cannot happen at eps=0? check
        for v in peel:
            for u in list(live.get(v, ())):
                live[u].discard(v)
                ne -= 1
            live.pop(v, None)
        live = {v: n for v, n in live.items() if True}
        if live:
            d = Fraction(ne, len(live))
            if d > best:
                best = d
                best_round = r
        trace.append((len(live), ne))
        if r > 200:
            raise RuntimeError("too many rounds")
    return best, best_round, r, trace


def matching(edges):
    # strict weight pack like MST: w = hash("mw:a:b"), order (w, a, b)
    wof = {(a, b): (string_hash(f"mw:{a}:{b}"), a, b) for a, b in edges}
    live = set(edges)
    matched = []
    r = 0
    while live:
        r += 1
        best = {}
        for e in live:
            a, b = e
            for v in (a, b):
                if v not in best or wof[e] > wof[best[v]]:
                    best[v] = e
        sel = [e for e in live if best[e[0]] == e and best[e[1]] == e]
        if not sel:
            raise RuntimeError("stuck")
        mv = set()
        for e in sel:
            matched.append(e)
            mv.add(e[0]); mv.add(e[1])
        live = {e for e in live if e[0] not in mv and e[1] not in mv}
    # greedy reference: sort by weight desc, take if endpoints free
    free = set()
    ref = []
    for e in sorted(wof, key=lambda e: wof[e], reverse=True):
        a, b = e
        if a not in free and b not in free:
            ref.append(e)
            free.add(a); free.add(b)
    return sorted(matched), r, sorted(ref)


for d in sys.argv[1:]:
    es = zipf_edges(d)
    best, br, rounds, trace = densest(es)
    m, mr, ref = matching(es)
    print(f"{d}: |E|={len(es)}")
    print(f"  densest: best={best} (~{float(best):.4f}) at round {br}, "
          f"peel_rounds={rounds} trace[:6]={trace[:6]}")
    print(f"  matching: |M|={len(m)} rounds={mr} local==greedy={m == ref}")
