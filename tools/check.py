#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, load the Spark parquet dump, sort columns by
name, and compare values (exact, like a hash compare would).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [key ...]
"""
import sys, json, math, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if isinstance(v, bool): return int(v)
    return v

n_pass = n_fail = 0
for key, sql in sorted(oracles.items()):
    if only and key not in only: continue
    files = glob.glob(f"{outdir}/{key}/*.parquet")
    if not files:
        print(f"FAIL {key}: no spark output"); n_fail += 1; continue
    try:
        oracle = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {key}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
    spark = con.execute(
        f"SELECT * FROM read_parquet('{outdir}/{key}/*.parquet')").fetch_arrow_table()
    ocols, scols = sorted(oracle.column_names), sorted(spark.column_names)
    if ocols != scols:
        print(f"FAIL {key}: cols oracle={ocols} spark={scols}"); n_fail += 1; continue
    # The driver compares pandas-rendered values, so dtype KIND differences
    # (e.g. DuckDB HUGEINT -> float64 vs Spark int64) fail its hash gate
    # even when values are identical (r1: dedup_simhash etc.). Width-only
    # differences (int32 vs int64) passed the r1 gate, so only kind counts.
    opd, spd = oracle.to_pandas(), spark.to_pandas()
    dt = [(c, str(opd[c].dtype), str(spd[c].dtype)) for c in ocols
          if opd[c].dtype.kind != spd[c].dtype.kind]
    if dt:
        print(f"FAIL {key}: dtype kind mismatch {dt}"); n_fail += 1; continue
    orows = [tuple(canon(r[c]) for c in ocols) for r in oracle.to_pylist()]
    srows = [tuple(canon(r[c]) for c in scols) for r in spark.to_pylist()]
    if orows == srows:
        print(f"PASS {key} ({len(srows)} rows)"); n_pass += 1
    else:
        n_fail += 1
        if len(orows) != len(srows):
            print(f"FAIL {key}: rowcount oracle={len(orows)} spark={len(srows)}")
        else:
            diffs = [(i, o, s) for i, (o, s) in enumerate(zip(orows, srows)) if o != s]
            print(f"FAIL {key}: {len(diffs)}/{len(orows)} rows differ; first: ")
            for i, o, s in diffs[:3]:
                print(f"  row {i}:\n   oracle={o}\n   spark ={s}")

print(f"\n{n_pass} pass / {n_fail} fail")
