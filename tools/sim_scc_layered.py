#!/usr/bin/env python3
"""Simulate graph_scc_layered (VERDICT r11 item #5: exercise the SCC
MULTI-PEEL path at gate scale) BEFORE any Spark code.

Derivation: the directed Zipf tier D, plus an OFF-shifted copy of D,
plus sparse ONE-WAY bridges (v -> v+OFF for stringHash("lbr:v") % 4
== 0) — layer 2's giant core is then reachable from layer 1 but can
never reach back, so in peel 1 the single color class (rooted at the
global min id, which sits in layer 1) flags ONLY the layer-1 core;
the layer-2 core is the non-root SCC that REQUIRES peel 2 — the path
no oracle-gated key has ever run (every plain fixture resolves in one
peel, trim-first).

Replicates the ENGINE's exact phase dynamics (edge trim to fixpoint,
min-color with pointer doubling, backward flag on same-color edges,
peel loop) to measure per-peel phase depths for the oracle unroll
caps, and validates final labels against an iterative Tarjan ground
truth (scc_id must equal the min member id).

Usage: python3 tools/sim_scc_layered.py <sfDir> [...]
"""
import sys
from collections import defaultdict

from sim_mst import string_hash

OFF = 1 << 17
BR_MOD = 4


def zipf_directed(d):
    import duckdb
    con = duckdb.connect()
    ids = con.execute(
        f"SELECT CAST(event_id AS VARCHAR) FROM '{d}/events.parquet'"
    ).fetchall()
    es = set()
    for (eid,) in ids:
        h1 = string_hash("kcu:" + eid); h2 = string_hash("kcb:" + eid)
        h3 = string_hash("kcv:" + eid); h4 = string_hash("kcc:" + eid)
        u = h1 % (1 << (h2 % 17)); v = h3 % (1 << (h4 % 17))
        if u != v:
            es.add((u, v))
    return sorted(es)


def layered(base):
    verts1 = sorted({x for e in base for x in e})
    es = set(base)
    es |= {(u + OFF, v + OFF) for u, v in base}
    es |= {(v, v + OFF) for v in verts1
           if string_hash(f"lbr:{v}") % BR_MOD == 0}
    return sorted(es)


def tarjan(edges, verts):
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    idx, low, onstk = {}, {}, set()
    stack, sccs = [], []
    cnt = [0]
    for s in verts:
        if s in idx:
            continue
        work = [(s, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                idx[v] = low[v] = cnt[0]; cnt[0] += 1
                stack.append(v); onstk.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in idx:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in onstk:
                    low[v] = min(low[v], idx[w])
            if recurse:
                continue
            if low[v] == idx[v]:
                comp = []
                while True:
                    w = stack.pop(); onstk.discard(w); comp.append(w)
                    if w == v:
                        break
                sccs.append(comp)
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[v])
    return {v: min(comp) for comp in sccs for v in comp}


def engine_phases(edges):
    """Engine-exact peel loop; returns (labels, per-peel phase depths,
    peels, complete)."""
    labels = {}
    active = set(edges)
    rem = {x for e in edges for x in e}
    depths = []
    peel = 0
    complete = False
    while not complete and peel < 3:
        peel += 1
        t = 0
        while True:
            srcs = {u for u, _ in active}
            dsts = {v for _, v in active}
            nxt = {(u, v) for u, v in active if u in dsts and v in srcs}
            t += 1
            if nxt == active:
                break
            active = nxt
        core = {x for e in active for x in e}
        for v in rem - core:
            labels[v] = v
        rem = set(core)
        if not core:
            complete = True
            break
        color = {v: v for v in core}
        c = 0
        while True:
            nc = {}
            inmin = defaultdict(lambda: 1 << 62)
            for u, v in active:
                inmin[v] = min(inmin[v], color[u])
            for v in core:
                nc[v] = min(color[v], inmin[v], color[color[v]])
            c += 1
            if nc == color:
                break
            color = nc
        sce = [(u, v) for u, v in active if color[u] == color[v]]
        radj = defaultdict(list)
        for u, v in sce:
            radj[v].append(u)
        flagged = {v for v in core if color[v] == v}
        f = 0
        while True:
            add = {u for v in flagged for u in radj[v]} - flagged
            f += 1
            if not add:
                break
            flagged |= add
        for v in flagged:
            labels[v] = color[v]
        rem -= flagged
        depths.append((t, c, f))
        complete = not rem
        if not complete:
            active = {(u, v) for u, v in active
                      if u not in flagged and v not in flagged}
    return labels, depths, peel, complete


for d in sys.argv[1:]:
    base = zipf_directed(d)
    es = layered(base)
    verts = sorted({x for e in es for x in e})
    labels, depths, peels, complete = engine_phases(es)
    truth = tarjan(es, verts)
    ok = labels == truth
    sizes = defaultdict(int)
    for v, l in labels.items():
        sizes[l] += 1
    big = sorted(((n, l) for l, n in sizes.items()), reverse=True)[:3]
    nbridge = sum(1 for v in {x for e in base for x in e}
                  if string_hash(f"lbr:{v}") % BR_MOD == 0)
    print(f"{d}: |V|={len(verts)} |E|={len(es)} bridges={nbridge} "
          f"peels={peels} depths(t,c,f)/peel={depths} "
          f"complete={complete} labels==tarjan={ok} top_sccs={big}")
