#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python tools/check.py [sfDir] [outDir]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
first (or run with --run to do it here). For each query parquet under
outDir, runs the matching oracle SQL from oracle_sql.json in DuckDB
(views registered for every testdata table) and compares: schema column
names (sorted), row count, and values (rows sorted by all columns, col
order = sorted names — approximating the driver's hash compare).
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    if "--run" in sys.argv:
        subprocess.run(["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
                       cwd="/root/repo", check=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(out_dir.iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        spark_rel = con.execute(
            f"SELECT * FROM '{qdir}/*.parquet'")
        spark_cols = sorted(spark_rel.description and
                            [c[0] for c in spark_rel.description])
        spark_rows = spark_rel.fetchall()
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(spark_rows)} rows")
            continue
        try:
            duck_rel = con.execute(oracle[name])
            duck_cols = sorted([c[0] for c in duck_rel.description])
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"  [FAIL] {name}: cols spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        # reorder both to sorted column order, then sort rows
        sidx = [[c[0] for c in spark_rel.description].index(c) for c in spark_cols]
        didx = [[c[0] for c in duck_rel.description].index(c) for c in duck_cols]
        s_sorted = sorted(tuple(norm(r[i]) for i in sidx) for r in spark_rows)
        d_sorted = sorted(tuple(norm(r[i]) for i in didx) for r in duck_rows)
        if len(s_sorted) != len(d_sorted):
            print(f"  [FAIL] {name}: rows spark={len(s_sorted)} duck={len(d_sorted)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(s_sorted, d_sorted) if a != b]
        if bad:
            print(f"  [FAIL] {name}: {len(bad)}/{len(s_sorted)} rows differ; "
                  f"first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
        else:
            print(f"  [ok] {name}: {len(s_sorted)} rows, cols={spark_cols}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
