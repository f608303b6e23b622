#!/usr/bin/env python3
"""Simulate graph_color_greedy (Jones-Plassmann with fixed strict
priorities) on the derived Zipf tier BEFORE any Spark code — measures
sync round count, color count, and validates the parallel rounds
against the sequential greedy-by-priority coloring (fixed strict
priorities make JP == greedy).

MEASURED (rounds 12 evidence for the X149 contract key):
- JP sync rounds GROW with scale: 7/21/43/74 at sf0.001/0.01/0.1/sf1
  -> no pinned oracle unroll exists; the ENGINE iterates to
  convergence (cap 160 = ~2x sf1) and the key is gated by the
  X37/X68 CONTRACT pattern instead of a color-by-color replay.
- color-0 class == the greedy MIS under the SAME "col:" priorities at
  every SF (515/3251/10149/21965) — greedy coloring gives 0 exactly
  to greedy-MIS members, and the ORACLE can compute that size with a
  bounded Luby unroll (measured luby rounds 2/3/7/4 -> cap 14).
- proper at every SF (0 conflicting edges), jp == sequential greedy
  at every SF, colors 4/4/8/12 <= maxdeg+1.

Usage: python3 tools/sim_color.py /root/testdata/sf0.001 [...]
"""
import sys
from sim_mst import zipf_edges, string_hash


def priorities(verts):
    return {v: string_hash(f"col:{v}") * 65536 + v for v in verts}


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


for d in sys.argv[1:]:
    es = zipf_edges(d)
    verts = sorted({x for e in es for x in e})
    pr = priorities(verts)
    col, rounds = jones_plassmann(es, verts, pr)
    g = greedy(es, verts, pr)
    ncol = len(set(col.values()))
    hist = {}
    for c in col.values():
        hist[c] = hist.get(c, 0) + 1
    ok = all(col[a] != col[b] for a, b in es)
    print(f"{d}: |V|={len(verts)} |E|={len(es)} rounds={rounds} "
          f"colors={ncol} hist={sorted(hist.items())[:8]} "
          f"proper={ok} jp==greedy={col == g}")
