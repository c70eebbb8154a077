#!/usr/bin/env python3
"""Local simulation of the driver's t2 correctness gate.

Usage: oracle_check.py <sf_dir> <verify_out_dir>

For each query dir in verify_out: load the Spark parquet result; if
oracle_sql.json has SQL for it, run it in DuckDB against views named after
the parquet tables; compare column names (sorted), row counts, and values.
"""
import json, sys, math
import duckdb
import pandas as pd
from pathlib import Path

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# same survival config as oracle_bench.py — at the gated SFs (sf10+) the
# heavy dedup oracles need an explicit memory ceiling and a spill dir or
# DuckDB aborts on allocation instead of spilling
import os
con.execute(f"SET memory_limit='{os.environ.get('ORACLE_CHECK_MEM', '100GB')}'")
spill = os.environ.get("ORACLE_CHECK_SPILL", "/tmp/duckdb_spill")
Path(spill).mkdir(parents=True, exist_ok=True)
con.execute(f"SET temp_directory='{spill}'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    path = f"{sf_dir}/{t}.parquet"
    # driver testdata is one file per table; Spark-written (e.g. tmp/sf1)
    # is a directory of part files — glob in that case
    if Path(path).is_dir():
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
fails, oks, rows_only = [], [], []
# Verify.scala dumps throwing queries here (alongside an empty marker dir
# per failure) so a broken query can never silently shrink the gate.
failed_path = Path(f"{out_dir}/_failed.json")
verify_failed = json.loads(failed_path.read_text()) if failed_path.exists() else {}
for n, m in verify_failed.items():
    fails.append((n, f"verify threw: {m}"))

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    # The driver sorts rows before hashing (its round-1 traceback shows
    # sort_values → lexsort). Doing the same here catches two failure
    # classes the old positional compare missed: unsortable cell types
    # (numpy arrays crash lexsort → polla_consensus r1) and row-order
    # differences hidden by matching ORDER BYs.
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

for qdir in sorted(Path(out_dir).iterdir()):
    if not qdir.is_dir():
        continue
    name = qdir.name
    if name in verify_failed:   # already reported above; dir is an empty marker
        continue
    try:
        spark_df = pd.read_parquet(qdir)
    except Exception as e:
        fails.append((name, f"spark result unreadable: {e}"))
        continue
    if name not in oracle:
        rows_only.append((name, len(spark_df)))
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    try:
        s, d = canon(spark_df), canon(duck_df)
    except Exception as e:
        # unsortable cell types (e.g. ndarray columns) fail THIS query's
        # compare, not the whole gate
        fails.append((name, f"uncanonicalizable result: {e}"))
        continue
    if list(s.columns) != list(d.columns):
        fails.append((name, f"columns spark={list(s.columns)} duck={list(d.columns)}"))
        continue
    if len(s) != len(d):
        fails.append((name, f"rowcount spark={len(s)} duck={len(d)}"))
        continue
    bad = None
    for c in s.columns:
        sv, dv = s[c], d[c]
        # The driver's value hash is dtype-sensitive (q32 r1: DuckDB
        # SUM(int)→HUGEINT→float64 vs Spark int64 hashed differently
        # despite equal values). Mirror that strictness.
        if sv.dtype.kind != dv.dtype.kind:
            bad = f"col {c}: dtype spark={sv.dtype} duck={dv.dtype}"
            break
        try:
            if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                eq = [(a == b) or (pd.isna(a) and pd.isna(b)) or
                      (isinstance(a, float) and isinstance(b, float) and
                       math.isclose(a, b, rel_tol=0, abs_tol=0))
                      for a, b in zip(sv.astype(float), dv.astype(float))]
            else:
                eq = [(str(a) == str(b)) or (pd.isna(a) and pd.isna(b))
                      for a, b in zip(sv, dv)]
        except Exception as e:
            bad = f"col {c}: compare error {e}"
            break
        if not all(eq):
            i = eq.index(False)
            bad = f"col {c} row {i}: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}"
            break
    if bad:
        fails.append((name, bad))
    else:
        oks.append((name, len(s)))

print(f"== OK ({len(oks)}):")
for n, r in oks: print(f"  {n}: {r} rows")
print(f"== ROWS-ONLY ({len(rows_only)}):")
for n, r in rows_only: print(f"  {n}: {r} rows")
print(f"== FAIL ({len(fails)}):")
for n, m in fails: print(f"  {n}: {m}")
sys.exit(1 if fails else 0)
