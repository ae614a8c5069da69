#!/usr/bin/env python3
"""Persistent DuckDB runner for PAIRED benchmarking (graft.Bench with
SPARK_GRAFT_PAIRED=1): reads one JSON request per line on stdin
({"name": ..., "sql_b64": ...}), executes the oracle SQL against the
same parquet tables, and answers one JSON line ({"name", "sec",
"rows"} or {"name", "err"}).

The point (r11 verdict item 6): the r10/r11 graft-vs-DuckDB ratio
spread (0.75-1.11x) was pure host-throttle WINDOW drift between the
two separate measurement passes. Bench drives this process right
after each graft query's timed run, so every per-query ratio is
same-window by construction.

Dev-only measurement tool — the shipped Scala library does not depend
on this (Bench degrades to unpaired with a warning if python/duckdb
are absent).
"""
import base64
import json
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1]
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    print(json.dumps({"ready": True}), flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        sql = base64.b64decode(req["sql_b64"]).decode("utf-8")
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            print(json.dumps({"name": req["name"],
                              "sec": round(time.time() - t0, 4),
                              "rows": n}), flush=True)
        except Exception as e:  # report, keep serving
            print(json.dumps({"name": req["name"],
                              "err": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
