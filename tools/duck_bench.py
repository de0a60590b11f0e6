#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB on an sf dir (the bench yardstick).

Usage: duck_bench.py <sfDir> <verifyOutDir-with-oracle_sql.json> [reps] [out]
Prints per-query first-run seconds (sorted desc) and the total, and writes
a DUCK_DETAILS.json (default /tmp/duck_times.json; pass `out` to commit it)
with the SAME per-query keys as BENCH_DETAILS.json, so the per-query 2x
adjudication is computable from two committed artifacts:
  sec      — first execution in this process (the "cold" yardstick; parquet
             is OS-page-cached across queries, as in the Spark bench)
  sec_warm — best of `reps - 1` further executions (plan+buffer warm)

Output schema (since round 4): {"metric", "value", ..., "queries":
[{"name", "sec", "sec_warm"?}, ...]} — a nested details list, NOT the
flat name->sec map earlier rounds wrote. In-repo consumers (BENCH_NOTES
adjudication) read the nested form.
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

sf_dir, out_dir = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
out_path = sys.argv[4] if len(sys.argv) > 4 else "/tmp/duck_times.json"
con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
details = []
for name in sorted(oracle):
    cold = warm = None
    for i in range(1 + max(0, reps - 1) if reps > 1 else 1):
        t0 = time.perf_counter()
        try:
            con.sql(oracle[name]).fetchall()
        except Exception as e:
            print(f"ERR {name}: {e}")
            break
        dt = time.perf_counter() - t0
        if i == 0:
            cold = dt
        else:
            warm = dt if warm is None else min(warm, dt)
    if cold is not None:
        d = {"name": name, "sec": round(cold, 4)}
        if warm is not None:
            d["sec_warm"] = round(warm, 4)
        details.append(d)
times = {d["name"]: d["sec"] for d in details}
for n, t in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
    print(f"{n:30s} {t:8.3f}")
print(f"TOTAL {sum(times.values()):.1f}s over {len(times)} queries")
json.dump({"metric": "total", "value": round(sum(times.values()), 3),
           "unit": "sec", "sf": sf_dir, "reps": reps,
           "engine": "duckdb-" + duckdb.__version__,
           "queries": details},
          open(out_path, "w"), indent=1)
print(f"wrote {out_path}")
