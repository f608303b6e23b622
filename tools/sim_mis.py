#!/usr/bin/env python3
"""Simulate graph_mis (deterministic-priority Luby maximal independent
set) on the derived Zipf tier BEFORE any Spark code — measures round
count, per-round MIS growth, and validates the synchronous rounds
against the sequential greedy-by-priority reference (they must agree:
fixed strict priorities make Luby == greedy).

Usage: python3 tools/sim_mis.py /root/testdata/sf0.001 [...]
"""
import sys
from sim_mst import zipf_edges, string_hash


def priorities(verts):
    # pack (hash, id): strict total order, ids < 2^16
    return {v: string_hash(f"mis:{v}") * 65536 + v for v in verts}


def luby(edges, verts, pr):
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    active = set(verts)
    mis = {}
    r = 0
    while active:
        r += 1
        sel = [v for v in active
               if all(pr[v] < pr[u] for u in adj[v] if u in active)]
        for v in sel:
            mis[v] = r
        drop = set(sel)
        for v in sel:
            drop |= adj[v] & active
        active -= drop
    return mis, r


def greedy(edges, verts, pr):
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    mis = set()
    blocked = set()
    for v in sorted(verts, key=lambda x: pr[x]):
        if v not in blocked:
            mis.add(v)
            blocked |= adj[v] | {v}
    return mis


for d in sys.argv[1:]:
    es = zipf_edges(d)
    verts = sorted({x for e in es for x in e})
    pr = priorities(verts)
    mis, rounds = luby(es, verts, pr)
    g = greedy(es, verts, pr)
    per_round = {}
    for v, r in mis.items():
        per_round[r] = per_round.get(r, 0) + 1
    print(f"{d}: |V|={len(verts)} |E|={len(es)} mis={len(mis)} "
          f"rounds={rounds} per_round={sorted(per_round.items())} "
          f"luby==greedy={set(mis) == g}")
