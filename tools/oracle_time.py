#!/usr/bin/env python3
"""Time each oracle's DuckDB side alone (no Spark compare) with a per-query
interrupt budget — builder-side tool to pick sf0.1 exclusions with MEASURED
reasons before the full gate run.

Usage: python3 tools/oracle_time.py <sfDir> <oracleSqlJson> [budgetSec]
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 600.0
    with open(oracle_json) as f:
        oracles = json.load(f)
    results = []
    for name, sql in sorted(oracles.items()):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        timer = threading.Timer(budget, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            dt = time.time() - t0
            print(f"  {dt:8.1f} s  {name} ({n} rows)", flush=True)
            results.append((dt, name))
        except Exception as e:
            dt = time.time() - t0
            print(f"  {dt:8.1f} s  {name} INTERRUPTED/ERROR: "
                  f"{str(e)[:80]}", flush=True)
            results.append((dt, name + " [X]"))
        finally:
            timer.cancel()
            con.close()
    print("--- slowest ---")
    for dt, name in sorted(results, reverse=True)[:10]:
        print(f"  {dt:8.1f} s  {name}")


if __name__ == "__main__":
    main()
