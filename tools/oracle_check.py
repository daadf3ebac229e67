#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [onlyRegex]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares row count, column names, dtypes, and
exact values (rows sorted, columns sorted by name — mirroring the
driver's described compare). Exits non-zero on any mismatch.

Both sides are materialized through pandas (`.df()`), NOT `fetchall`,
because the driver hashes pandas-rendered values: DuckDB HUGEINT (the
result type of SUM(BIGINT)) has no pandas integer dtype and silently
becomes float64, so an uncast aggregate renders `4568.0` against the
engine's `4568` and fails the driver's hash even though the numbers
are identical. Comparing through pandas makes that divergence fail
HERE, in the local pre-flight (round-2 verdict item 2).
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
    if v is None or v != v:  # pandas NaT/None
        return "NaN"
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
            # .df() (pandas), not fetchall(): mirrors the driver's hash
            # path where HUGEINT/UINT64 degrade to float64.
            got_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp_df = con.sql(sql).df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: error {e}")
            continue
        got_cols = list(got_df.columns)
        exp_cols = list(exp_df.columns)
        if sorted(map(str.lower, got_cols)) != sorted(map(str.lower, exp_cols)):
            failed.append(name)
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            continue
        # reorder columns by sorted name, then sort rows
        gs = got_df[sorted(got_cols, key=str.lower)]
        es = exp_df[sorted(exp_cols, key=str.lower)]
        gdt, edt = list(map(str, gs.dtypes)), list(map(str, es.dtypes))
        if gdt != edt:
            # Diagnostic only: the driver hashes rendered values, so
            # int32-vs-int64 passes it, but float64-vs-int64 renders
            # "4568.0" vs "4568" and fails below.
            bad = [(c, a, b) for c, a, b in zip(gs.columns, gdt, edt) if a != b]
            print(f"WARN {name}: dtype drift {bad} "
                  "(if one side is float64: uncast DuckDB aggregate? "
                  "SUM(BIGINT) is HUGEINT -> float64 in pandas; add ::BIGINT)")
        g = sorted(tuple(norm(v) for v in r) for r in gs.itertuples(index=False))
        e = sorted(tuple(norm(v) for v in r) for r in es.itertuples(index=False))
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
