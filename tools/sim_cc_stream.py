#!/usr/bin/env python3
"""Simulate stream_cc_labels BEFORE any Spark code.

(a) Oracle depth: synchronous min-label propagation WITH pointer
    doubling over the undirected Zipf tier — rounds to fixpoint.
(b) Incremental fold: replay the edges in 4 deterministic batches
    ((a+b) % 4); per batch run the same fixpoint over (label stars +
    batch edges); verify the final labels equal one-shot CC min-ids
    and measure per-batch rounds.

Usage: python3 tools/sim_cc_stream.py <sfdir> [...]
"""
import sys
from sim_mst import zipf_edges


def minprop(edges, labels):
    """Sync min-label + doubling to fixpoint over und edges; returns
    (labels, rounds)."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = dict(labels)
    for v in adj:
        lab.setdefault(v, v)
    r = 0
    while True:
        r += 1
        nxt = {}
        for v in lab:
            m = lab[v]
            m = min(m, lab.get(lab[v], lab[v]))  # doubling
            for u in adj.get(v, ()):
                m = min(m, lab[u])
            nxt[v] = m
        if nxt == lab:
            return lab, r - 1  # last round was a no-op probe
        lab = nxt


def true_cc(edges):
    par = {}
    def find(x):
        par.setdefault(x, x)
        while par[x] != x:
            par[x] = par.get(par[x], par[x]); x = par[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in list(par)}


def contracted_fold(lab, batch):
    """Round-14 fold variant: map batch endpoints through current state
    labels FIRST, run the fixpoint only on the CONTRACTED label graph
    (distinct inter-component label pairs + new ids), then relabel the
    full state with one composition. Returns (labels, rounds, |ce|)."""
    ce = set()
    for a, b in batch:
        la, lb = lab.get(a, a), lab.get(b, b)
        if la != lb:
            ce.add((min(la, lb), max(la, lb)))
    if not ce:
        return dict(lab), 0, 0
    clab, r = minprop(sorted(ce), {})
    nxt = {v: clab.get(l, l) for v, l in lab.items()}
    for v, m in clab.items():
        if v not in nxt:
            nxt[v] = m
    return nxt, r, len(ce)


for d in sys.argv[1:]:
    es = zipf_edges(d)
    # (a) one-shot oracle depth
    lab1, r1 = minprop(es, {})
    ref = true_cc(es)
    # (b) 4-batch incremental fold
    lab = {}
    rounds = []
    # (c) contracted-first fold (round-14 ccFold)
    clab_st = {}
    crounds, csizes = [], []
    for k in range(4):
        batch = [(a, b) for (a, b) in es if (a + b) % 4 == k]
        stars = [(v, l) for v, l in lab.items() if v != l]
        lab, r = minprop(batch + stars, lab)
        rounds.append(r)
        clab_st, cr, cn = contracted_fold(clab_st, batch)
        crounds.append(cr)
        csizes.append(cn)
    ncomp = len(set(lab1.values()))
    print(f"{d}: |E|={len(es)} comps={ncomp} oneshot_rounds={r1} "
          f"batch_rounds={rounds} oneshot==uf={lab1 == ref} "
          f"incr==uf={lab == ref}")
    print(f"  contracted: rounds={crounds} |ce|={csizes} "
          f"contracted==uf={clab_st == ref}")
    # replay idempotence of the contracted fold (CcMaintainer contract)
    rp, rr, _ = contracted_fold(clab_st,
                                [(a, b) for (a, b) in es if (a + b) % 4 == 1])
    print(f"  contracted replay: rounds={rr} unchanged={rp == clab_st}")
