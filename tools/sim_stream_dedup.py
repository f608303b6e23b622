#!/usr/bin/env python3
"""Simulate stream_dedup_minhash BEFORE any Spark code (rule-11
discipline; judge r12 item #3): the streaming-ingestion near-dup fold.

RULE (the true iterative keep-first closure — the rule ADVICE r12 noted
dedup_rate_curve only upper-bounds): process docs in doc_id order; doc d
is KEPT iff NO already-KEPT doc d' < d both (a) shares at least one of
the 4 MinHash band buckets with d (the X2 signature expressions,
UNcapped — state holds only kept docs, and near-identical content
collapses to one representative, so kept buckets stay narrow naturally)
and (b) verifies at full-shingle-set jaccard >= TAU ppm.

Equivalently: the lexicographically-first MIS (greedy by id) on the
verified candidate graph — computable in parallel by fixed-priority
rounds (rule 22), so this sim measures the ROUND DEPTH of the frontier
closure (kept if all smaller neighbors decided-dropped; dropped if any
smaller neighbor decided-kept) plus prefix-composability under batching.

Prints per SF: |docs|, |docs with shingles|, candidate pairs, verified
pairs, kept count, closure rounds; asserts the round-based closure ==
the sequential fold, and that folding in doc_id-ordered batches of
several widths reproduces the one-shot result after every prefix.

Usage: python3 tools/sim_stream_dedup.py /root/testdata/sf0.001 [...]
"""
import sys
import duckdb
from sim_mst import string_hash

PRIME = 2147483647
BANDS = [
    (0, 1103515245, 12345, 214013, 2531011),
    (1, 69069, 362437, 134775813, 1),
    (2, 1664525, 1013904223, 22695477, 1),
    (3, 48271, 0, 16807, 0),
]
TAU_PPM = 500000


def shingles(text):
    w = text.split(" ")
    return {string_hash(" ".join(w[i:i + 3])) for i in range(len(w) - 2)}


def sigs(hs):
    out = []
    for band, a1, b1, a2, b2 in BANDS:
        mh1 = min((h * a1 % PRIME + b1) % PRIME for h in hs)
        mh2 = min((h * a2 % PRIME + b2) % PRIME for h in hs)
        out.append((band, mh1, mh2))
    return out


def jac_ppm(a, b):
    i = len(a & b)
    return i * 1000000 // (len(a) + len(b) - i)


def verified_pairs(docs):
    """All (d1 < d2) pairs sharing a band bucket AND jaccard >= TAU."""
    bucket = {}
    for d, hs in docs.items():
        for key in sigs(hs):
            bucket.setdefault(key, []).append(d)
    cand = set()
    widths = sorted((len(v) for v in bucket.values()), reverse=True)
    for ds in bucket.values():
        ds.sort()
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    ver = {(a, b) for a, b in cand if jac_ppm(docs[a], docs[b]) >= TAU_PPM}
    return cand, ver, widths[:5]


def sequential_fold(ids, ver_adj):
    kept = set()
    dup_of = {}
    for d in ids:
        partner = min((k for k in ver_adj.get(d, ()) if k < d and k in kept),
                      default=None)
        if partner is None:
            kept.add(d)
        else:
            dup_of[d] = partner
    return kept, dup_of


def round_closure(ids, ver_adj):
    """Fixed-priority (doc_id) frontier rounds; returns kept, rounds."""
    state = {}  # d -> True kept / False dropped
    r = 0
    undecided = set(ids)
    while undecided:
        r += 1
        newly = {}
        for d in undecided:
            smaller = [u for u in ver_adj.get(d, ()) if u < d]
            if any(state.get(u) is True for u in smaller):
                newly[d] = False
            elif all(state.get(u) is False for u in smaller):
                newly[d] = True
        if not newly:
            raise RuntimeError("stuck")
        state.update(newly)
        undecided -= set(newly)
    return {d for d, k in state.items() if k}, r


for d in sys.argv[1:]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{d}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    docs = {}
    for did, text in rows:
        hs = shingles(text)
        if hs:
            docs[did] = hs
    cand, ver, topw = verified_pairs(docs)
    adj = {}
    for a, b in ver:
        adj.setdefault(b, set()).add(a)
        adj.setdefault(a, set()).add(b)
    ids = sorted(docs)
    kept, dup_of = sequential_fold(ids, adj)
    kept_r, rounds = round_closure(ids, adj)
    assert kept == kept_r, f"{d}: rounds != sequential"
    # prefix-composability: id-ordered batches, any width, reproduce the
    # one-shot fold on every prefix (the StreamingSpec contract)
    for width in (7, 97):
        state_kept = set()
        seen = []
        for i in range(0, len(ids), width):
            batch = ids[i:i + width]
            seen += batch
            for b in batch:
                p = min((k for k in adj.get(b, ()) if k < b
                         and k in state_kept), default=None)
                if p is None:
                    state_kept.add(b)
            ref, _ = sequential_fold(seen, adj)
            assert state_kept == ref, f"{d}: prefix w={width} diverged"
    # REP-COLLAPSE equivalence (the engine's X2-style optimization): run
    # the closure on exact-dup representatives only, then map members
    # back (copy d of rep r: dropped, dup_of = r if r kept else
    # dup_of(r)). Must equal the straight rule INCLUDING dup_of.
    text_by_id = dict(rows)
    rep = {}
    for did in ids:  # min doc_id per text among shingled docs
        t = text_by_id[did]
        rep.setdefault(t, did)
    reps = sorted(rep.values())
    repset = set(reps)
    rdocs = {r2: docs[r2] for r2 in reps}
    rcand, rver, _ = verified_pairs(rdocs)
    radj = {}
    for a, b in rver:
        radj.setdefault(b, set()).add(a)
        radj.setdefault(a, set()).add(b)
    rkept, rdup = sequential_fold(reps, radj)
    kept2 = set()
    dup2 = {}
    for did in ids:
        r2 = rep[text_by_id[did]]
        if did == r2:
            if did in rkept:
                kept2.add(did)
            else:
                dup2[did] = rdup[did]
        else:
            dup2[did] = r2 if r2 in rkept else rdup[r2]
    assert kept2 == kept, f"{d}: rep-collapse kept set diverged"
    assert dup2 == dup_of, f"{d}: rep-collapse dup_of diverged"
    n_all = len(rows)
    print(f"{d}: docs={n_all} shingled={len(docs)} cand={len(cand)} "
          f"verified={len(ver)} kept={len(kept)} dropped={len(docs)-len(kept)} "
          f"rounds={rounds} reps={len(reps)} rep_verified={len(rver)} "
          f"top_bucket_widths={topw}")
