#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB on an sf dir (the bench yardstick).

Usage: duck_bench.py <sfDir> <verifyOutDir-with-oracle_sql.json> [reps]
Prints per-query best-of-reps seconds (sorted desc) and the total.
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

sf_dir, out_dir = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
times = {}
for name in sorted(oracle):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        try:
            con.sql(oracle[name]).fetchall()
        except Exception as e:
            print(f"ERR {name}: {e}")
            break
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    if best is not None:
        times[name] = best
for n, t in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
    print(f"{n:30s} {t:8.3f}")
print(f"TOTAL {sum(times.values()):.1f}s over {len(times)} queries")
json.dump({k: round(v, 4) for k, v in times.items()},
          open("/tmp/duck_times.json", "w"))
