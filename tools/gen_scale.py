#!/usr/bin/env python3
"""Scale-evidence data generator: replicate an sf directory N times with
key-shifted ids (each copy's keys are offset by k * (max_key + 1), so all
foreign-key relationships stay consistent within a copy and disjoint across
copies). Dimension tables region/nation are copied unchanged.

pyarrow is used (not DuckDB) so physical parquet types round-trip exactly —
whatever encoding the current fixture generation ships for events.ts
(TIMESTAMP(NANOS) historically, TIMESTAMP(MICROS) since 2026-08-13) is
preserved bit-for-bit, so the scaled copy exercises the same read path.

Usage: python3 tools/gen_scale.py <srcDir> <dstDir> [factor=10]
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src, dst = sys.argv[1], sys.argv[2]
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)

# key column -> (table defining its keyspace, column to take max over)
KEYSPACES = {
    "KC": ("customer", "c_custkey"),
    "KS": ("supplier", "s_suppkey"),
    "KO": ("orders", "o_orderkey"),
    "KP": ("part", "p_partkey"),
    "KE": ("events", "event_id"),
    "KU": ("events", "user_id"),
    "KD": ("documents", "doc_id"),
    "KV": ("embeddings", "vec_id"),
}
# string key columns that must stay UNIQUE per row across copies (real
# TPC-H names are key-derived and unique; duplicate names would change
# name-keyed query semantics, e.g. encode_string_ids' dictionary)
SUFFIX = {
    "customer": ["c_name"],
    "supplier": ["s_name"],
}
SHIFTS = {
    "customer": {"c_custkey": "KC"},
    "supplier": {"s_suppkey": "KS"},
    "part": {"p_partkey": "KP"},
    "orders": {"o_orderkey": "KO", "o_custkey": "KC"},
    "lineitem": {"l_orderkey": "KO", "l_partkey": "KP", "l_suppkey": "KS"},
    "events": {"event_id": "KE", "user_id": "KU"},
    "documents": {"doc_id": "KD"},
    "embeddings": {"vec_id": "KV"},
    "region": {},
    "nation": {},
}

base = {}
for key, (table, col) in KEYSPACES.items():
    t = pq.read_table(f"{src}/{table}.parquet", columns=[col])
    base[key] = pc.max(t[col]).as_py() + 1

for table, shifts in SHIFTS.items():
    t = pq.read_table(f"{src}/{table}.parquet")
    if not shifts:  # dimension: single unchanged copy
        pq.write_table(t, f"{dst}/{table}.parquet")
        print(f"{table}: {t.num_rows} rows (copied)")
        continue
    copies = []
    for k in range(factor):
        cols = []
        for name in t.column_names:
            col = t[name]
            if k > 0 and name in shifts:
                orig = col.type
                col = pc.add(col, k * base[shifts[name]]).cast(orig)
            if k > 0 and name in SUFFIX.get(table, []):
                col = pc.binary_join_element_wise(
                    pc.cast(col, pa.string()), f"~{k}", "")
            cols.append(col)
        copies.append(pa.table(cols, names=t.column_names))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{table}.parquet")
    print(f"{table}: {t.num_rows} -> {out.num_rows} rows")
