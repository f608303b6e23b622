#!/usr/bin/env python3
"""Landing sim for MULTI-LEVEL graph_leiden (round 16, judge r15 item #4):
run the published outer loop — after level 1's aggregate-move drains,
re-REFINE the new vertex partition, re-AGGREGATE, and run the move phase
again; stop when a level applies zero moves AND splits nothing.

Level 1 is exactly the X182 pipeline (see sim_leiden_full.py). Each
further level l:
  * V_{l-1}: vertex -> community labels after level l-1;
  * REFINE: connected parts of each V_{l-1} community (BFS over the
    intra-community original edges, min-member-id part labels);
  * AGGREGATE: part graph, initial community of a part = its parent
    V_{l-1} label;
  * MOVE rounds (locally-dominant matching) to drain.

Reports per SF and per level: splits, refine BFS depth, move rounds,
movers per round, community count, and exact q_num (monotone check
across levels). The engine caps and oracle unroll depths for the level-2
CTEs come straight from these numbers.

Usage: python3 tools/sim_leiden_multilevel.py <oracle_sql.json> [sfDir ...]
"""
import collections
import json
import sys

import duckdb

oracle_path = sys.argv[1]
sfdirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                          "/root/testdata/sf0.1"]
oracles = json.load(open(oracle_path))
p_sql = oracles["graph_louvain_passes"]


def refine(labs, ue):
    """Connected parts within each labs-community; min member id labels.
    Returns (part map, splits, max BFS depth)."""
    adj = collections.defaultdict(list)
    for s, d in ue:
        if labs[s] == labs[d]:
            adj[s].append(d)
    part = {}
    maxdepth = 0
    for v in sorted(labs):
        if v in part:
            continue
        frontier, depth = [v], 0
        part[v] = v
        while frontier:
            nxt = []
            for u in frontier:
                for w2 in adj[u]:
                    if w2 not in part:
                        part[w2] = v
                        nxt.append(w2)
            if nxt:
                depth += 1
            frontier = nxt
        maxdepth = max(maxdepth, depth)
    per_comm = collections.defaultdict(set)
    for v, p in part.items():
        per_comm[labs[v]].add(p)
    splits = sum(1 for ps in per_comm.values() if len(ps) > 1)
    return part, splits, maxdepth


def move_to_drain(part, labs, ue, two_m):
    """Aggregate-move phase on the part graph. Returns (final part labels,
    rounds, movers history)."""
    w = collections.Counter()
    for s, d in ue:
        w[(part[s], part[d])] += 1
    deg = collections.Counter()
    for (a, b), c in w.items():
        deg[a] += c
    lab = {p: labs[p] for p in deg}
    rounds, movers_hist = 0, []
    while True:
        tot = collections.Counter()
        for p, d in deg.items():
            tot[lab[p]] += d
        k = collections.defaultdict(collections.Counter)
        for (a, b), c in w.items():
            if a != b:
                k[a][lab[b]] += c
        cand = []
        for p in deg:
            c0 = lab[p]
            kc = k[p][c0]
            best = None
            for dl, kv in k[p].items():
                if dl == c0:
                    continue
                g = (kv - kc) * two_m - deg[p] * (tot[dl] - tot[c0] + deg[p])
                key = (-g, dl)
                if g > 0 and (best is None or key < best[0]):
                    best = (key, dl, g)
            if best is not None:
                cand.append((p, c0, best[1], best[2]))
        if not cand:
            break
        mx = {}
        for p, c0, dl, g in cand:
            for x in (c0, dl):
                if x not in mx or (g, p) > mx[x]:
                    mx[x] = (g, p)
        applied = [(p, c0, dl, g) for p, c0, dl, g in cand
                   if mx[c0] == (g, p) and mx[dl] == (g, p)]
        assert applied
        for p, _, dl, _ in applied:
            lab[p] = dl
        rounds += 1
        movers_hist.append(len(applied))
    return lab, rounds, movers_hist


def q_num(vlab, ue, two_m):
    deg = collections.Counter()
    for s, d in ue:
        deg[s] += 1
    tot = collections.Counter()
    for v, l in vlab.items():
        tot[l] += deg[v]
    intra = sum(1 for s, d in ue if vlab[s] == vlab[d])
    return two_m * intra - sum(t * t for t in tot.values())


for path in sfdirs:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{path}/events.parquet')")
    labs = dict((r[0], r[1]) for r in con.execute(p_sql).fetchall())
    ue = con.execute("""
      WITH edges AS (
        SELECT src, dst FROM (
          SELECT user_id AS src,
                 lead(user_id) OVER (PARTITION BY event_type
                                     ORDER BY event_id) AS dst
          FROM events) WHERE dst IS NOT NULL GROUP BY 1, 2)
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges""") \
        .fetchall()
    ue = [(s, d) for s, d in ue if s != d]
    two_m = len(ue)

    vlab = labs
    level = 0
    print(f"{path}:")
    while True:
        level += 1
        part, splits, rdepth = refine(vlab, ue)
        plab, rounds, movers = move_to_drain(part, vlab, ue, two_m)
        nvlab = {v: plab[part[v]] for v in vlab}
        print(f"  level {level}: splits={splits} refine_depth={rdepth} "
              f"move_rounds={rounds} movers={movers} "
              f"comms={len(set(nvlab.values()))} "
              f"q_num={q_num(nvlab, ue, two_m)}")
        changed = nvlab != vlab
        vlab = nvlab
        if rounds == 0 and splits == 0:
            print(f"  drained at level {level} "
                  f"(changed_labels={changed})")
            break
        if rounds == 0 and not changed:
            print(f"  drained at level {level} (splits repaired only, "
                  f"no label change)")
            break
        if level > 6:
            print("  NOT drained after 6 levels")
            break
