#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [jsonOut]
Reads outDir/<name>/ parquet (written by graft.Verify) and oracle_sql.json,
runs each oracle in DuckDB over views named after the parquet tables in
sfDir, and compares: schema (column names), row count, and a hash of all
values after sorting columns by name and sorting rows. With a third arg,
also writes a per-query record in the driver's CORRECTNESS_r{N}.json shape.
"""
import sys, json, glob, os, atexit, shutil
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
json_out = sys.argv[3] if len(sys.argv) > 3 else None
records = {}

def record(name, rows_match, schema_match, hash_match, srows, orows, err):
    records[name] = {"rows_match": rows_match, "schema_match": schema_match,
                     "hash_match": hash_match, "spark_rows": srows,
                     "oracle_rows": orows, "err": err}
    if json_out:  # incremental: a crash mid-board keeps what's done
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1)

con = duckdb.connect()
# bound the engine and give it a spill path: the default (80% of RAM, no
# temp dir relative to cwd) lets a windowed 10M-row oracle hit the OOM
# killer before it ever spills
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_CHECK_MEM', '40GB')}'")
# per-process spill dir: two concurrent checkers sharing one directory
# corrupt each other's duckdb_temp_storage-N.tmp files (observed: a
# parallel run's spill read failed mid-compare and marked a correct
# query failed)
spill_dir = f"/tmp/duckdb_spill_{os.getpid()}"
con.execute(f"SET temp_directory='{spill_dir}'")
# the pid-specific dir fixes concurrent-checker corruption, but orphaned
# spill from an aborted big-oracle run can reach tens of GB — always
# remove it when this process exits (DuckDB has already released its
# temp files by interpreter teardown)
atexit.register(lambda: shutil.rmtree(spill_dir, ignore_errors=True))
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # driver testdata = single files; ScaleUp-generated sf dirs = Spark
    # parquet directories — glob inside those
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize for compare: timestamps → iso strings, floats → repr;
    # +0.0 kills negative zero (DuckDB ROUND keeps the sign of a tiny
    # negative, Spark's doesn't — numerically equal, repr-distinct)
    for c in df.columns:
        df[c] = df[c].map(
            lambda v: repr(v + 0.0) if isinstance(v, float) else repr(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

# Results past this size skip pandas and compare inside DuckDB: the repr
# canon materializes every cell as a Python string — a 10M-row frame OOMs
# a 128 GiB box — while the DuckDB path streams a canonical per-row
# varchar through hash() and compares (count, unordered hash sum).
BIG = 1_000_000

def hash_expr(rel):
    # pandas-equivalent canonicalization per column, in-engine: floats
    # and decimals → DOUBLE (+0.0 kills negative zero, matching canon),
    # everything else → VARCHAR; both sides pass through the same casts
    # so engine-specific varchar formatting cancels out.
    parts = []
    for cname, ctype in sorted(zip(rel.columns, rel.types),
                               key=lambda t: t[0]):
        c, t = f'"{cname}"', str(ctype).upper()
        if t in ("FLOAT", "DOUBLE") or t.startswith("DECIMAL"):
            c = f"(CAST({c} AS DOUBLE) + 0.0)"
        elif t == "DATE" or t.startswith("TIMESTAMP"):
            # pandas coerces DATE and TIMESTAMP alike to datetime64 —
            # mirror that: DuckDB DATE + INTERVAL yields TIMESTAMP where
            # Spark yields DATE, equal values, varchar-distinct
            c = f"CAST({c} AS TIMESTAMP)"
        parts.append(f"COALESCE(CAST({c} AS VARCHAR), chr(1))")
    row = " || chr(2) || ".join(parts)
    return (f"COUNT(*), COALESCE(SUM(CAST(hash({row}) AS HUGEINT)), 0)")

fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fails += 1
        record(name, False, False, False, 0, 0, "no spark output"); continue
    spark_sql = f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
    try:
        # materialize the oracle ONCE (temp table, spills under the
        # memory limit): count, hash, and pandas compare all read the
        # materialization — running the full oracle twice (count probe +
        # compare) doubled oracle wall time on expensive cascades
        con.execute(f"CREATE OR REPLACE TEMP TABLE oracle_result AS {sql}")
        orel = con.sql("SELECT * FROM oracle_result")
        srel = con.sql(spark_sql)
        ocols, scols = sorted(orel.columns), sorted(srel.columns)
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            fails += 1
            record(name, False, False, False, 0, 0, None); continue
        sn = con.execute(f"SELECT COUNT(*) FROM ({spark_sql})").fetchone()[0]
        on = con.execute("SELECT COUNT(*) FROM oracle_result").fetchone()[0]
        # past BIG rows the pandas repr-canon would OOM — compare
        # in-engine instead (count + unordered hash sum over the
        # materialized oracle and the parquet scan)
        if max(sn, on) > BIG:
            scnt, shash = con.execute(
                f"SELECT {hash_expr(srel)} FROM ({spark_sql})").fetchone()
            ocnt, ohash = con.execute(
                f"SELECT {hash_expr(orel)} FROM oracle_result").fetchone()
            if scnt != ocnt:
                print(f"FAIL {name}: rows spark={scnt} oracle={ocnt}")
                fails += 1
                record(name, False, True, False, scnt, ocnt, None); continue
            if shash != ohash:
                print(f"FAIL {name}: hash mismatch over {scnt} rows")
                fails += 1
                record(name, True, True, False, scnt, ocnt, None); continue
            print(f"PASS {name} ({scnt} rows, in-engine hash)")
            record(name, True, True, True, scnt, ocnt, None); continue
        expected, got = orel.df(), srel.df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1
        record(name, False, False, False, 0, 0, f"oracle error: {e}"); continue
    if len(got) != len(expected):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(expected)}")
        fails += 1
        record(name, False, True, False, len(got), len(expected), None); continue
    a, b = canon(got), canon(expected)
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        print(f"FAIL {name}: value mismatch on {int(diff.sum())}/{len(a)} rows")
        mism = a[diff].head(3).to_string(), b[diff].head(3).to_string()
        print("  spark :", mism[0].replace("\n", "\n          "))
        print("  oracle:", mism[1].replace("\n", "\n          "))
        fails += 1
        record(name, True, True, False, len(got), len(expected), None); continue
    print(f"PASS {name} ({len(got)} rows)")
    record(name, True, True, True, len(got), len(expected), None)

if json_out:
    with open(json_out, "w") as f:
        json.dump(records, f, indent=1)
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
