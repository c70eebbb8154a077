#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB and write a per-query seconds file.

Usage: oracle_bench.py <sf_dir> <oracle_sql.json> <out_json>

`graft.Bench` loads the committed output (scripts/oracle_times_<sf>.json)
and stamps per-query Spark/DuckDB ratios into its JSON line, so a
q51-class perf regression is visible in the bench artifact itself without
a judge re-run. Regenerate whenever oracle SQL changes:

  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/oracle_bench.py /root/testdata/sf0.1 \
      /tmp/verify_out/oracle_sql.json scripts/oracle_times_sf0.1.json

(The oracle SQL dump is scale-independent; the timing SF dir is what
matters and must match what Bench runs at.)
"""
import json, os, sys, time
from pathlib import Path

import duckdb

sf_dir, sql_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]

# Quiet-host gate, same policy as graft.Bench: REFUSE to record times on
# a loaded host (a load-20 spike once inflated a committed times file by
# 35% and every downstream vs_oracle ratio with it). Wait bounded, then
# abort WITHOUT writing rather than record garbage.
MAX_LOAD = float(os.environ.get("ORACLE_BENCH_MAX_LOAD", "2.5"))
MAX_WAIT = int(os.environ.get("ORACLE_BENCH_LOAD_WAIT_SEC", "600"))
waited = 0
while os.getloadavg()[0] > MAX_LOAD and waited < MAX_WAIT:
    print(f"[oracle_bench] load {os.getloadavg()[0]:.2f} > {MAX_LOAD} — "
          f"waiting ({waited}/{MAX_WAIT}s)", file=sys.stderr)
    time.sleep(15)
    waited += 15
if os.getloadavg()[0] > MAX_LOAD:
    sys.exit(f"[oracle_bench] host still loaded after {MAX_WAIT}s — "
             "refusing to record a contaminated times file")

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.loads(Path(sql_path).read_text())
times = {}
for name, sql in sorted(oracle.items()):
    runs = []
    for _ in range(2):  # min of 2, same hygiene as graft.Bench
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        runs.append(time.perf_counter() - t0)
    times[name] = round(min(runs), 6)

# a spike can also land MID-run (it did): check again before writing.
# The post-run threshold is HIGHER than the pre-run one because this
# script's own 32-thread DuckDB run legitimately drives the 1-minute
# load to ~2–4 — gating post-run at the pre-run bar rejects every
# healthy recording (it did that too).
MAX_LOAD_AFTER = float(os.environ.get("ORACLE_BENCH_MAX_LOAD_AFTER", "4.5"))
if os.getloadavg()[0] > MAX_LOAD_AFTER:
    sys.exit(f"[oracle_bench] load rose to {os.getloadavg()[0]:.2f} during "
             "the run — an external spike landed, refusing to write")

out = {
    "_meta": {
        "sf_dir": sf_dir,
        "recorded_unix": int(time.time()),
        "load_avg": round(os.getloadavg()[0], 2),
        "duckdb": duckdb.__version__,
        "threads": os.cpu_count(),
    },
    "times": times,
}
Path(out_path).write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
print(f"wrote {out_path}: {len(times)} queries, "
      f"total {sum(times.values()):.2f}s, load {out['_meta']['load_avg']}")
