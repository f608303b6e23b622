#!/usr/bin/env python3
"""Simulate graph_mst_boruvka on the derived Zipf tier (exact engine
arithmetic) BEFORE any Spark code — measures Boruvka round count, per-round
hook-tree depth (sizes the pointer-doubling unroll), MSF size, and
validates the result against a sequential Kruskal reference.

Usage: python3 tools/sim_mst.py /root/testdata/sf0.001 [...more dirs]
"""
import sys, duckdb

HASH_MOD = 1000000007
KC_BITS = 17

def string_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % HASH_MOD
    return h

def zipf_edges(d):
    con = duckdb.connect()
    ids = con.execute(
        f"SELECT CAST(event_id AS VARCHAR) FROM '{d}/events.parquet'"
    ).fetchall()
    es = set()
    for (eid,) in ids:
        h1 = string_hash("kcu:" + eid); h2 = string_hash("kcb:" + eid)
        h3 = string_hash("kcv:" + eid); h4 = string_hash("kcc:" + eid)
        u = h1 % (1 << (h2 % KC_BITS)); v = h3 % (1 << (h4 % KC_BITS))
        if u != v:
            es.add((min(u, v), max(u, v)))
    return sorted(es)

def kruskal(edges_w, verts):
    par = {v: v for v in verts}
    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]; x = par[x]
        return x
    msf = []
    for w, a, b in sorted(edges_w):
        ra, rb = find(a), find(b)
        if ra != rb:
            par[ra] = rb; msf.append((a, b, w))
    return sorted(msf)

def boruvka(edges_w, verts):
    comp = {v: v for v in verts}
    msf = set()
    rounds = 0
    depth_log = []
    while True:
        cross = [(w, a, b) for (w, a, b) in edges_w
                 if comp[a] != comp[b]]
        if not cross:
            break
        rounds += 1
        best = {}
        for (w, a, b) in cross:
            for c in (comp[a], comp[b]):
                k = (w, a, b)
                if c not in best or k < best[c]:
                    best[c] = k
        for (w, a, b) in best.values():
            msf.add((a, b, w))
        # pointer graph on comps
        parent = {}
        for c, (w, a, b) in best.items():
            parent[c] = comp[b] if comp[a] == c else comp[a]
        # break 2-cycles: keep the min endpoint as root
        for c in list(parent):
            p = parent[c]
            if parent.get(p) == c:
                r = min(c, p)
                parent[r] = r
        # measure depth before jumping
        def depth(c):
            d = 0
            while parent.get(c, c) != c:
                c = parent[c]; d += 1
                if d > 10 ** 6:
                    raise RuntimeError("cycle!")
            return d
        maxd = max(depth(c) for c in parent)
        # pointer doubling rounds needed
        jumps = 0
        cur = dict(parent)
        while any(cur.get(cur.get(c, c), cur.get(c, c)) != cur.get(c, c)
                  for c in cur):
            cur = {c: cur.get(cur[c], cur[c]) for c in cur}
            jumps += 1
        depth_log.append((maxd, jumps))
        # resolve
        root = {}
        for c in parent:
            x = c
            while parent.get(x, x) != x:
                x = parent[x]
            root[c] = x
        comp = {v: root.get(comp[v], comp[v]) for v in verts}
    return sorted(msf), rounds, depth_log, comp

if __name__ == "__main__":
    for d in sys.argv[1:]:
        es = zipf_edges(d)
        verts = sorted({x for e in es for x in e})
        edges_w = [(string_hash(f"mstw:{a}:{b}"), a, b) for (a, b) in es]
        msf_b, rounds, dlog, comp = boruvka(edges_w, verts)
        msf_k = kruskal(edges_w, verts)
        ncomp = len(set(comp.values()))
        wsum = sum(w for (_, _, w) in msf_b)
        dup_w = len(edges_w) - len({w for (w, _, _) in edges_w})
        print(f"{d}: |V|={len(verts)} |E|={len(es)} msf={len(msf_b)} "
              f"comps={ncomp} rounds={rounds} depth/jumps={dlog} "
              f"wsum={wsum} dupw={dup_w} "
              f"boruvka==kruskal={msf_b == msf_k}")
