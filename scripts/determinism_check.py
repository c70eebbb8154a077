#!/usr/bin/env python3
"""Determinism cross-check: compare two graft.Verify dumps made at
different parallelism (e.g. SPARK_GRAFT_CPUS=32 vs 7).

Usage: determinism_check.py <out_dir_a> <out_dir_b>

A query whose result depends on partition count/order (undeterministic
tie-breaks, float sum order, collect order) shows up as a value diff
here even though each single run passes its oracle. Expected: every
query identical after canonical row sort.
"""
import sys
import pandas as pd
from pathlib import Path

a_dir, b_dir = Path(sys.argv[1]), Path(sys.argv[2])
names = sorted(d.name for d in a_dir.iterdir() if d.is_dir())
names_b = {d.name for d in b_dir.iterdir() if d.is_dir()}
fails, oks = [], 0

def canon(df):
    df = df[sorted(df.columns)]
    try:
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    except Exception:
        # unsortable cells (arrays): stringify for ordering only
        key = df.astype(str)
        order = key.sort_values(by=list(df.columns), kind="mergesort").index
        return df.loc[order].reset_index(drop=True)

for n in sorted(names_b - set(names)):
    fails.append((n, "missing in A"))
for n in names:
    if n not in names_b:
        fails.append((n, "missing in B")); continue
    try:
        da, db = pd.read_parquet(a_dir / n), pd.read_parquet(b_dir / n)
    except Exception as e:
        fails.append((n, f"unreadable: {e}")); continue
    if sorted(da.columns) != sorted(db.columns):
        fails.append((n, f"columns {sorted(da.columns)} vs {sorted(db.columns)}")); continue
    if len(da) != len(db):
        fails.append((n, f"rowcount {len(da)} vs {len(db)}")); continue
    ca, cb = canon(da), canon(db)
    same = True
    for c in ca.columns:
        va, vb = ca[c].astype(str), cb[c].astype(str)
        if not (va == vb).all():
            i = (va != vb).idxmax()
            fails.append((n, f"col {c} row {i}: {va[i]!r} vs {vb[i]!r}"))
            same = False
            break
    if same:
        oks += 1

print(f"== identical: {oks}/{len(names)}")
if fails:
    print(f"== DIFF ({len(fails)}):")
    for n, m in fails:
        print(f"  {n}: {m}")
sys.exit(1 if fails else 0)
