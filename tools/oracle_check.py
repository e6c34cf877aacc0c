#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by `graft.Verify` (<out>/<name>/ parquet dir) with an
entry in <out>/oracle_sql.json, runs the oracle SQL in DuckDB over the same
parquet tables and compares row count, sorted-column names, and value
multisets (rounded repr hash). Exit 1 on any mismatch.

This is a builder-side testing tool only (driver-side python deps allowed
for testing; the engine itself is pure Scala/Spark).
"""
import glob
import json
import math
import os
import sys
from collections import Counter

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    bag = Counter(tuple(canon(r[i]) for i in order) for r in rows)
    return names, bag


def main():
    # usage: oracle_check.py <sfDir> <verifyOutDir> [--exclude a,b,c]
    # excluded names are skipped with a SKIP line (for quadratic-truth-set
    # oracles at large sf; record the measured reason in BASELINE.md)
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    excluded = set()
    only = None
    if len(sys.argv) > 4 and sys.argv[3] == "--exclude":
        excluded = set(sys.argv[4].split(","))
    if len(sys.argv) > 4 and sys.argv[3] == "--only":
        only = set(sys.argv[4].split(","))
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; Spark-written dirs (MakeSf1)
        # are directories of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    import time
    failures = []
    for name, sql in sorted(oracles.items()):
        if name in excluded or (only is not None and name not in only):
            if only is None:
                print(f"  SKIP {name}: excluded by name", flush=True)
            continue
        t0 = time.time()
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            failures.append((name, "no spark output parquet"))
            continue
        got = con.execute(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])").fetchall()
        got_cols = [d[0] for d in con.description]
        try:
            rel = con.sql(sql)
            exp_cols = list(rel.columns)
            # Type guard: the driver's hasher lowers DuckDB results through
            # arrow/pandas, where HUGEINT (int128, e.g. sum(BIGINT)) and
            # DECIMAL become float64/object and flip the hash even when every
            # value prints identically. Fail HERE so an un-cast aggregate
            # can't ship (cast to BIGINT / round to DOUBLE in the oracle SQL).
            bad_types = [
                f"{c}:{t}" for c, t in zip(exp_cols, rel.types)
                if any(k in str(t).upper() for k in ("HUGEINT", "DECIMAL"))]
            if bad_types:
                failures.append(
                    (name, f"oracle emits driver-unsafe column type(s) "
                           f"{bad_types}; CAST to BIGINT/DOUBLE in the SQL"))
                continue
            exp = rel.fetchall()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        gn, gb = frame_key(got_cols, got)
        en, eb = frame_key(exp_cols, exp)
        if gn != en:
            failures.append((name, f"schema mismatch: spark={gn} duckdb={en}"))
        elif len(got) != len(exp):
            failures.append((name, f"row count: spark={len(got)} duckdb={len(exp)}"))
        elif gb != eb:
            diff_g = list((gb - eb).items())[:3]
            diff_e = list((eb - gb).items())[:3]
            failures.append(
                (name, f"value mismatch; spark-only={diff_g} duckdb-only={diff_e}"))
        else:
            print(f"  OK   {name}: {len(got)} rows "
                  f"({time.time() - t0:.1f} s)", flush=True)
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    n_run = len(oracles) - len(excluded & set(oracles))
    print(f"{n_run - len(failures)}/{n_run} queries match "
          f"({len(excluded & set(oracles))} excluded of {len(oracles)})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
