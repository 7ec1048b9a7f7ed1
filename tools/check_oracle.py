#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: run each oracle SQL
in DuckDB over the testdata parquet tables, load the Spark parquet dump,
sort columns by name, and compare row counts, schemas, and values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, time
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # bit-exact: the engine's contract is identical IEEE doubles, and
        # rounding here would mask drift the driver's hash compare catches
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except Exception:
        pass
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        run_errors = json.load(open(f"{out_dir}/_errors.json"))
    except Exception:
        run_errors = {}
    fails, passes, timings = [], [], {}
    t_all = time.time()
    for name in sorted(oracle):
        if name in run_errors:
            fails.append((name, f"verify run error: {run_errors[name]}"))
            continue
        sql = oracle[name]
        t0 = time.time()
        try:
            odf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            fails.append((name, f"oracle error: {e}"))
            continue
        finally:
            timings[name] = time.time() - t0
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fails.append((name, "no spark output"))
            continue
        sdf = pq.read_table(files[0])
        ocols, scols = sorted(odf.column_names), sorted(sdf.column_names)
        if ocols != scols:
            fails.append((name, f"schema: oracle={ocols} spark={scols}"))
            continue
        if odf.num_rows != sdf.num_rows:
            fails.append((name, f"rows: oracle={odf.num_rows} spark={sdf.num_rows}"))
            continue
        orows = [tuple(norm(odf.column(c)[i].as_py()) for c in ocols)
                 for i in range(odf.num_rows)]
        srows = [tuple(norm(sdf.column(c)[i].as_py()) for c in ocols)
                 for i in range(sdf.num_rows)]
        if orows != srows:
            bad = next(i for i in range(len(orows)) if orows[i] != srows[i])
            fails.append((name, f"value mismatch at row {bad}:\n  oracle={orows[bad]}\n  spark ={srows[bad]}"))
            continue
        passes.append(name)
    # per-query oracle cost, slowest first: an x66-class oracle must show
    # its cost the day it lands, not the round the driver times out
    # (round-17 gate post-mortem — the budget has to stay visible)
    top = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print(f"ORACLE {time.time() - t_all:.1f}s total; slowest: "
          + " ".join(f"{n}={s:.1f}s" for n, s in top))
    print(f"PASS {len(passes)}: {' '.join(passes)}")
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    if not fails:
        print("ALL GREEN")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
