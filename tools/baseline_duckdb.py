#!/usr/bin/env python3
"""Measure a single-node DuckDB baseline for the graft query surface.

Runs every oracle SQL (the exact semantics each graft query declares,
as dumped by Verify into oracle_sql.json) in DuckDB against the same
parquet tables, one subprocess per query (isolation + timeout), and
writes a per-query seconds JSON. Compare against bench_out.json from
`graft.Bench` on the same SF to get a measured engine-vs-engine ratio
on identical semantics and identical data.

Dev-only measurement tool — the shipped Scala library does not depend
on this. Note the caveat recorded in BASELINE.md: a handful of oracles
REPLAY engine-pinned plans (PQ codebooks, unrolled pagerank), which is
the fair comparison for "same declared computation" but not "best
hand-written DuckDB".

Usage: baseline_duckdb.py <sfDir> <oracle_sql.json> <out.json> [timeout_s]
"""
import json
import subprocess
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

RUNNER = r"""
import duckdb, json, sys, time
sf, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
for t in %(tables)s:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
t0 = time.time()
n = len(con.execute(sql).fetchall())
print(json.dumps({"sec": time.time() - t0, "rows": n}))
"""


def main():
    sf, oracle_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 240.0
    oracles = json.load(open(oracle_path))
    runner = RUNNER % {"tables": repr(TABLES)}
    results, failed = {}, {}
    for name in sorted(oracles):
        try:
            r = subprocess.run([sys.executable, "-c", runner, sf],
                               input=oracles[name], capture_output=True,
                               text=True, timeout=timeout)
            if r.returncode == 0:
                d = json.loads(r.stdout.strip().splitlines()[-1])
                results[name] = round(d["sec"], 3)
            else:
                failed[name] = r.stderr.strip().splitlines()[-1][:200] if r.stderr else "error"
        except subprocess.TimeoutExpired:
            failed[name] = f"timeout>{timeout}s"
        state = results.get(name, failed.get(name))
        print(f"{name}: {state}", file=sys.stderr)
    out = {"sf": sf, "total": round(sum(results.values()), 3),
           "n_queries": len(results), "queries": results, "failed": failed}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in ("sf", "total", "n_queries")}))


if __name__ == "__main__":
    main()
