#!/usr/bin/env python3
"""Local pre-check mirroring the driver's t2 DuckDB-oracle compare.

Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/*.parquet (written by `sbt "runMain graft.Verify
<sfDir> <verifyOutDir>"`) and <verifyOutDir>/oracle_sql.json, runs each
oracle against DuckDB views over the same test tables, and compares:
row count, column names (sorted), dtypes, and values (exact for
ints/strings, tight tolerance for floats). Exit 1 on any mismatch.

Driver-side tooling only (python/duckdb are not dependencies of the
library itself).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, spark_rows, duck_rows, cols):
    if len(spark_rows) != len(duck_rows):
        return f"row count spark={len(spark_rows)} duck={len(duck_rows)}"
    for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
        for c, (x, y) in zip(cols, zip(a, b)):
            x, y = norm(x), norm(y)
            if isinstance(x, float) and isinstance(y, float):
                if not (x == y or abs(x - y) < 1e-9 * max(1.0, abs(x))):
                    return f"row {i} col {c}: spark={x!r} duck={y!r}"
            elif x != y:
                return f"row {i} col {c}: spark={x!r} duck={y!r} (types {type(x).__name__}/{type(y).__name__})"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures, passed, skipped = [], 0, 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        cols_s, cols_d = sorted(spark_df.columns), sorted(duck_df.columns)
        if cols_s != cols_d:
            failures.append((name, f"columns spark={cols_s} duck={cols_d}"))
            continue
        sd = spark_df[cols_s]
        dd = duck_df[cols_s]
        if [str(t) for t in sd.dtypes.values] != [str(t) for t in dd.dtypes.values]:
            print(f"  [warn] {name}: dtypes spark={list(map(str, sd.dtypes.values))} "
                  f"duck={list(map(str, dd.dtypes.values))}")
        err = compare(name, list(sd.itertuples(index=False, name=None)),
                      list(dd.itertuples(index=False, name=None)), cols_s)
        if err:
            failures.append((name, err))
        else:
            passed += 1
            print(f"  [ok] {name} ({len(sd)} rows)")
    # rows-only queries (no oracle): just confirm the parquet is readable
    import glob
    import os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracles or (only and name not in only):
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"  [rows-only] {name}: {n} rows")
            skipped += 1
        except Exception as e:
            failures.append((name, f"rows-only output unreadable: {e}"))
    print(f"\n{passed} oracle-matched, {skipped} rows-only, {len(failures)} failed")
    for name, err in failures:
        print(f"  [FAIL] {name}: {err}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
