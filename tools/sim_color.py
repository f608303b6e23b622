#!/usr/bin/env python3
"""Simulate graph_coloring (Jones-Plassmann with fixed strict
priorities) on the derived Zipf tier BEFORE any Spark code — measures
sync round count, color count, oracle Luby-MIS unroll depth, and
validates the parallel rounds against the sequential
greedy-by-priority coloring (fixed strict priorities make JP ==
greedy, for ANY strict priority).

PRIORITY (round 14): DEGREE-FIRST — p(v) = (65535 - deg(v)) << 46 |
hash("col:"+v) << 16 | v. Hubs color first, which shortens the
priority chains that bound JP's sync depth on the Zipf tier
(hub-centered stars resolve in one round instead of serializing
behind hash order). Measured against the r12 hash-only priority:

  rounds:      sf0.001 7->6, sf0.01 21->13, sf0.1 43->27, sf1 74->44
  colors:      sf0.01 4->3, sf0.1 8->6, sf1 12->7 (hub-first is
               closer to largest-degree-first greedy, a known
               quality win)
  luby rounds (oracle cms-chain depth for the color-0 == greedy-MIS
  check): hash 2/3/7/4 -> degree 3/3/7/4 (cap 14 keeps 2x margin)

MEASURED invariants (every SF): proper (0 conflicting edges),
jp == sequential greedy, color-0 class == greedy MIS, colors <=
maxdeg+1.

Usage: python3 tools/sim_color.py /root/testdata/sf0.001 [...]
"""
import sys
from sim_mst import zipf_edges, string_hash


def priorities(verts, deg):
    return {v: ((65535 - deg[v]) << 46) | (string_hash(f"col:{v}") << 16)
            | v for v in verts}


def mex(used):
    c = 0
    while c in used:
        c += 1
    return c


def jones_plassmann(edges, verts, pr):
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    color = {}
    r = 0
    while len(color) < len(verts):
        r += 1
        # a vertex colors itself when its priority is the strict MIN
        # among uncolored neighbors (min matches the MIS convention)
        sel = [v for v in verts if v not in color and
               all(pr[v] < pr[u] for u in adj[v] if u not in color)]
        if not sel:
            raise RuntimeError("stuck")
        for v in sel:
            color[v] = mex({color[u] for u in adj[v] if u in color})
    return color, r


def greedy(edges, verts, pr):
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    color = {}
    for v in sorted(verts, key=lambda x: pr[x]):
        color[v] = mex({color[u] for u in adj[v] if u in color})
    return color


def luby_rounds(edges, verts, pr):
    """Rounds of the oracle's cms chain: select strict-local-min among
    REMAINING, remove selected + neighbors; depth = rounds to empty."""
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    alive = set(verts)
    mis = set()
    r = 0
    while alive:
        r += 1
        sel = [v for v in alive if
               all(pr[v] < pr[u] for u in adj[v] if u in alive)]
        mis.update(sel)
        drop = set(sel)
        for v in sel:
            drop.update(adj[v])
        alive -= drop
    return mis, r


for d in sys.argv[1:]:
    es = zipf_edges(d)
    verts = sorted({x for e in es for x in e})
    deg = {v: 0 for v in verts}
    for a, b in es:
        deg[a] += 1; deg[b] += 1
    pr = priorities(verts, deg)
    col, rounds = jones_plassmann(es, verts, pr)
    g = greedy(es, verts, pr)
    mis, lrounds = luby_rounds(es, verts, pr)
    ncol = len(set(col.values()))
    hist = {}
    for c in col.values():
        hist[c] = hist.get(c, 0) + 1
    ok = all(col[a] != col[b] for a, b in es)
    color0 = {v for v, c in col.items() if c == 0}
    print(f"{d}: |V|={len(verts)} |E|={len(es)} rounds={rounds} "
          f"colors={ncol} luby_rounds={lrounds} "
          f"n_color0={len(color0)} hist={sorted(hist.items())[:8]} "
          f"proper={ok} jp==greedy={col == g} "
          f"color0==greedyMIS={color0 == mis}")
