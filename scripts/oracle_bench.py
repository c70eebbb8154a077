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
