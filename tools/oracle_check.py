#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [onlyRegex]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares row count, column names, and exact
values (rows sorted, columns sorted by name — mirroring the driver's
described compare). Exits non-zero on any mismatch.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # subset runs (SPARK_GRAFT_VERIFY_ONLY)
        import re
        pat = re.compile(sys.argv[3])
        sqls = {n: q for n, q in sqls.items() if pat.search(n)}
    failed = []
    for name, sql in sorted(sqls.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = got_rel.columns
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = exp_rel.columns
            exp = exp_rel.fetchall()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: error {e}")
            continue
        if sorted(map(str.lower, got_cols)) != sorted(map(str.lower, exp_cols)):
            failed.append(name)
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            continue
        # reorder columns by sorted name, then sort rows
        gi = [got_cols.index(c) for c in sorted(got_cols, key=str.lower)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols, key=str.lower)]
        g = sorted(tuple(norm(r[i]) for i in gi) for r in got)
        e = sorted(tuple(norm(r[i]) for i in ei) for r in exp)
        if len(g) != len(e):
            failed.append(name)
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            continue
        if g != e:
            failed.append(name)
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            continue
        print(f"OK   {name}: {len(g)} rows")
    print(f"\n{len(sqls) - len(failed)}/{len(sqls)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
