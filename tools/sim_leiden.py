#!/usr/bin/env python3
"""Landing sim for graph_leiden_refine (X177): measures, per SF, the
structure the key will report and the oracle unroll depth it needs.

For each fixture: run the graph_louvain_full oracle SQL (taken from a
Verify dump's oracle_sql.json) to get the composed community labels,
build the INTRA-community undirected adjacency in python, and BFS from
the min-id vertex of every connected part:

  * parts / split communities  -> the key's honest fixture verdict
    (zero splits everywhere: the tiled generator's communities are
    internally connected, so X177 certifies rather than repairs);
  * max BFS depth from the min vertex -> the min-label fixpoint round
    count, hence the oracle unroll bound (measured 1/2/3/2 at
    sf0.001/0.01/0.1/sf1; LeidenCcIters = 8 covers with margin).

Usage: python3 tools/sim_leiden.py <oracle_sql.json> [sfDir ...]
"""
import collections
import json
import sys

import duckdb

oracle_path = sys.argv[1]
sfdirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                          "/root/testdata/sf0.1"]
sql = json.load(open(oracle_path))["graph_louvain_full"]

for path in sfdirs:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{path}/events.parquet')")
    labs = dict((r[0], r[1]) for r in con.execute(sql).fetchall())
    ue = con.execute("""
      WITH edges AS (
        SELECT src, dst FROM (
          SELECT user_id AS src,
                 lead(user_id) OVER (PARTITION BY event_type
                                     ORDER BY event_id) AS dst
          FROM events) WHERE dst IS NOT NULL GROUP BY 1, 2)
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges""") \
        .fetchall()
    adj = collections.defaultdict(list)
    for s, d in ue:
        if s != d and labs.get(s) is not None and labs.get(s) == labs.get(d):
            adj[s].append(d)
    seen = set()
    maxdepth = nparts = 0
    per_comm = collections.defaultdict(int)
    for v in sorted(labs):          # sorted => v is its part's min id
        if v in seen:
            continue
        frontier, depth = [v], 0
        seen.add(v)
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in seen:
                        seen.add(w)
                        nxt.append(w)
            if nxt:
                depth += 1
            frontier = nxt
        maxdepth = max(maxdepth, depth)
        nparts += 1
        per_comm[labs[v]] += 1
    splits = sum(1 for c in per_comm.values() if c > 1)
    print(f"{path}: communities={len(set(labs.values()))} parts={nparts} "
          f"split_comms={splits} max_min_vertex_depth={maxdepth}")
