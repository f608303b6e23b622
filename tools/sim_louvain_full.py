#!/usr/bin/env python3
"""Simulate graph_louvain_full (multi-PASS Louvain: move rounds +
community contraction, repeated) on G_user BEFORE any Spark code —
exact engine arithmetic (integer (2m)^2-scaled gains, parity move
schedule), measuring per-pass move counts / community counts /
modularity so the pass and round counts can be PINNED for the oracle
unroll, and checking non-degeneracy (a pass >= 2 must change labels
at some SF, else the key is a re-emission of graph_louvain_passes).

Pass 1 must bit-match graph_louvain_passes (X124): same 8 rounds,
same gain, same parity schedule — the weighted general code below
reduces to it when every weight is 1 and there are no self-loops.

MEASURED (first sim run): parity-SYNCHRONOUS moves on the CONTRACTED
graph are NOT monotone — at sf0.01 pass 2 dropped q_num by 3.78e6
(simultaneous super-node moves interact; each gain assumes the others
stay). Passes >= 2 therefore run GREEDY-AS-ROUNDS instead: one
globally-best strictly-positive move per round (the MMR/matching
packed-argmax discipline) — every applied move is a true sequential
Louvain move, so Q strictly increases; budget-capped, extra rounds
no-op. The contracted graph is communities-sized, so the per-round
work is tiny at any scale.

MEASURED (second sim run, greedy + mutual-merge variants):
- greedy-as-rounds (one best move/round): monotone, but 48 sequential
  rounds at sf0.1 — an unrollable but 50-round oracle and a heavy
  driver loop.
- mutual-best-merge rounds (locally-dominant matching over community
  pairs, gain(C,D) = 2m*(w(C,D)+w(D,C)) - 2*tot(C)*tot(D), disjoint
  merges additive => monotone): sf0.001 0 rounds; sf0.01 4 rounds to
  exhaustion, SAME final q_num as greedy (13256176, 5 communities);
  sf0.1 11 rounds, q 2103293328 vs greedy 2103354586 (-0.003%), same
  11 communities; sf1 0 rounds (pass 1 already lands the 10 planted
  communities exactly, q=3444117017270). CHOSEN: merge rounds,
  pinned cap 16.
- pass 3 is PROVABLY a no-op under merge dynamics: the pair gain
  depends only on w(C,D) and tot, both invariant under contraction,
  so a merge exhausted at pass 2 stays exhausted — the composed key
  is pass1 + contraction + merge pass, with the audit emitting
  q_num(pass 0/1/2).

Usage: python3 tools/sim_louvain_full.py <sfDir> [...more dirs]
"""
import sys
from collections import defaultdict

import duckdb


def guser_uedges(d):
    """Undirected multiset view of G_user (both orientations), self rows
    dropped (they are dropped by the Spark/oracle side up front)."""
    con = duckdb.connect()
    rows = con.execute(f"""
      WITH edges AS (
        SELECT src, dst, COUNT(*) AS n FROM (
          SELECT user_id AS src,
                 lead(user_id) OVER (PARTITION BY event_type
                                     ORDER BY event_id) AS dst
          FROM '{d}/events.parquet') WHERE dst IS NOT NULL GROUP BY 1, 2)
      SELECT src, dst, CAST(SUM(n) AS BIGINT) FROM (
        SELECT src, dst, 1 AS n FROM edges
        UNION ALL
        SELECT dst, src, 1 FROM edges) WHERE src <> dst GROUP BY 1, 2
    """).fetchall()
    # NOTE: the engine's uedges multiset counts each GROUPED directed
    # pair once per orientation (value column ignored) — n=1 per
    # orientation row, so w(u,v) = 1 normally, 2 when both (u,v) and
    # (v,u) existed as directed pairs.
    w = {}
    for s_, t_, n in rows:
        w[(s_, t_)] = n
    return w


def move_rounds(w, lab, two_m, rounds, r0):
    """Synchronous weighted general-gain move rounds with the parity
    schedule, starting at round index r0+1 (parity continues across
    passes the way the engine will run it: r is the GLOBAL round)."""
    moves_per_round = []
    for r in range(r0 + 1, r0 + rounds + 1):
        deg = defaultdict(int)
        for (u, v), n in w.items():
            deg[u] += n          # self rows included in degree
        tot = defaultdict(int)
        for v, l in lab.items():
            tot[l] += deg[v]
        kvd = defaultdict(int)   # (v, D) -> weight, EXCLUDING self rows
        for (u, v), n in w.items():
            if u != v:
                kvd[(u, lab[v])] += n
        best = {}
        for (v, D), k in kvd.items():
            C = lab[v]
            if D == C:
                continue
            gain = (k - kvd.get((v, C), 0)) * two_m \
                - deg[v] * (tot[D] - tot[C] + deg[v])
            cur = best.get(v)
            if cur is None or (-gain, D) < cur:
                best[v] = (-gain, D)
        moved = 0
        for v, (ng, D) in best.items():
            if (v + r) % 2 == 0 and -ng > 0:
                lab[v] = D
                moved += 1
        moves_per_round.append(moved)
    return moves_per_round


def greedy_moves(w, lab, two_m, budget):
    """One globally-best positive-gain single-node move per round,
    argmax by (-gain, v, D) — deterministic, monotone, budget-capped.
    Returns number of applied moves."""
    applied = 0
    for _ in range(budget):
        deg = defaultdict(int)
        for (u, v), n in w.items():
            deg[u] += n
        tot = defaultdict(int)
        for v, l in lab.items():
            tot[l] += deg[v]
        kvd = defaultdict(int)
        for (u, v), n in w.items():
            if u != v:
                kvd[(u, lab[v])] += n
        best = None
        for (v, D), k in kvd.items():
            C = lab[v]
            if D == C:
                continue
            gain = (k - kvd.get((v, C), 0)) * two_m \
                - deg[v] * (tot[D] - tot[C] + deg[v])
            if gain > 0 and (best is None or (-gain, v, D) < best):
                best = (-gain, v, D)
        if best is None:
            break
        _, v, D = best
        lab[v] = D
        applied += 1
    return applied


def contract(w, lab):
    """(community -> super-node) contraction: weighted super-edges
    including self-loops; new labels = identity on super-nodes."""
    nw = defaultdict(int)
    for (u, v), n in w.items():
        nw[(lab[u], lab[v])] += n
    return dict(nw), {c: c for c in set(lab.values())}


def q_num(w, lab, two_m):
    """Exact integer modularity numerator sum_C (2m*in(C) - tot(C)^2),
    where in(C) counts both orientations + contracted self rows."""
    deg = defaultdict(int)
    for (u, v), n in w.items():
        deg[u] += n
    tot = defaultdict(int)
    for v, l in lab.items():
        tot[l] += deg[v]
    inn = defaultdict(int)
    for (u, v), n in w.items():
        if lab[u] == lab[v]:
            inn[lab[u]] += n
    return sum(two_m * inn[c] - tot[c] * tot[c] for c in tot)


for d in sys.argv[1:]:
    w = guser_uedges(d)
    verts = sorted({x for e in w for x in e})
    two_m = sum(w.values())
    lab = {v: v for v in verts}
    print(f"== {d}: |V|={len(verts)} 2m={two_m}")
    qs = [q_num(w, lab, two_m)]
    # mapping from ORIGINAL vertex to current super-node
    orig = {v: v for v in verts}
    mv = move_rounds(w, lab, two_m, 8, 0)
    q = q_num(w, lab, two_m)
    print(f"  pass 1: moves/round={mv} "
          f"communities={len(set(lab.values()))} q_num={q} "
          f"dq={q - qs[-1]}")
    qs.append(q)
    for v in orig:
        orig[v] = lab[orig[v]]
    w, lab = contract(w, lab)
    for p in [2, 3]:
        moved = greedy_moves(w, lab, two_m, budget=200)
        ncomm = len(set(lab.values()))
        q = q_num(w, lab, two_m)
        print(f"  pass {p}: greedy moves={moved} communities={ncomm} "
              f"q_num={q} dq={q - qs[-1]}")
        qs.append(q)
        for v in orig:
            orig[v] = lab[orig[v]]
        w, lab = contract(w, lab)
    sizes = defaultdict(int)
    for v in orig.values():
        sizes[v] += 1
    top = sorted(sizes.values(), reverse=True)[:8]
    print(f"  final communities={len(sizes)} top sizes={top}")
    assert all(b >= a for a, b in zip(qs, qs[1:])), "Q must not decrease"
