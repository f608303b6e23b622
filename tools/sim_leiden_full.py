#!/usr/bin/env python3
"""Landing sim for graph_leiden (X182 — the FULL Leiden pipeline): measure,
per SF, everything the engine loop caps and the oracle unroll depths need.

Pipeline simulated (deterministic Leiden after Traag et al. 2019):
  1. P = the engine's 8-round move-phase labels (graph_louvain_passes
     oracle SQL -> per-vertex community).
  2. REFINE: split every P-community into CONNECTED parts (BFS) — the
     X177 guarantee applied to the PRE-merge labels (X177 itself refines
     the post-merge composed labels).
  3. AGGREGATE: contract to the part graph (nodes = parts, w = edge
     multiset counts incl. self rows; d = row sums), initial community
     of a part = its P label.
  4. MOVE rounds on the contracted graph: per round every part proposes
     its best strictly-positive general-gain move (weighted X124 gain,
     ties to smallest target community); a proposal applies iff it is
     the (gain, part-id)-max among ALL proposals touching either of its
     two communities (locally-dominant matching on the community pair
     graph -> applied moves touch disjoint communities -> the modularity
     increase is EXACTLY the sum of gains, monotone). Drain = no
     strictly-positive proposal.

Reports per SF: parts / split communities of P, min-vertex BFS depth
(refine CC unroll bound), move rounds to drain (engine cap + oracle
unroll bound), movers per round, final community count vs louvain_full's,
and the exact q_num before/after (monotonicity check).

Usage: python3 tools/sim_leiden_full.py <oracle_sql.json> [sfDir ...]
"""
import collections
import json
import sys

import duckdb

oracle_path = sys.argv[1]
sfdirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                          "/root/testdata/sf0.1"]
oracles = json.load(open(oracle_path))
# graph_louvain_passes emits (id, community, comm_size)
p_sql = oracles["graph_louvain_passes"]
full_sql = oracles["graph_louvain_full"]

for path in sfdirs:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{path}/events.parquet')")
    labs = dict((r[0], r[1]) for r in con.execute(p_sql).fetchall())
    nfull = len(set(r[1] for r in con.execute(full_sql).fetchall()))
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

    # 2. refine: connected parts of each P community (min member id label)
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
                for w in adj[u]:
                    if w not in part:
                        part[w] = v
                        nxt.append(w)
            if nxt:
                depth += 1
            frontier = nxt
        maxdepth = max(maxdepth, depth)
    per_comm = collections.defaultdict(set)
    for v, p in part.items():
        per_comm[labs[v]].add(p)
    splits = sum(1 for ps in per_comm.values() if len(ps) > 1)

    # 3. aggregate on parts
    w = collections.Counter()
    for s, d in ue:
        w[(part[s], part[d])] += 1
    deg = collections.Counter()
    for (a, b), c in w.items():
        deg[a] += c
    lab = {p: labs[p] if p in labs else None for p in deg}
    # initial community of part p = P label of its min vertex (= p's label)
    lab = {p: labs[p] for p in deg}

    def q_num(lab):
        tot = collections.Counter()
        for p, d in deg.items():
            tot[lab[p]] += d
        intra = sum(c for (a, b), c in w.items() if lab[a] == lab[b]
                    and a != b)
        # NOTE self rows (a==b) are intra by definition
        intra += sum(c for (a, b), c in w.items() if a == b)
        return two_m * intra - sum(t * t for t in tot.values())

    # 4. move rounds
    rounds = 0
    movers_hist = []
    q0 = q_num(lab)
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
        assert applied, "positive candidates but no applied pick"
        gsum = sum(g for _, _, _, g in applied)
        qb = q_num(lab)
        for p, _, dl, _ in applied:
            lab[p] = dl
        qa = q_num(lab)
        assert qa - qb == 2 * gsum, (qa - qb, 2 * gsum)
        rounds += 1
        movers_hist.append(len(applied))
    q1 = q_num(lab)
    ncomm = len(set(lab.values()))
    print(f"{path}: P_comms={len(set(labs.values()))} parts={len(deg)} "
          f"split_comms={splits} refine_depth={maxdepth} "
          f"move_rounds={rounds} movers={movers_hist} "
          f"final_comms={ncomm} louvain_full_comms={nfull} "
          f"q {q0} -> {q1} (monotone={q1 >= q0})")
