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
# Big-SF hygiene (the sf10 recording died on a bad allocation without
# these): cap resident memory below the host and give DuckDB a spill
# directory so a heavy self-join degrades to disk instead of aborting
# the whole recording.
con.execute("SET memory_limit='96GB'")
spill = os.environ.get("ORACLE_BENCH_SPILL", "/tmp/duckdb_spill")
os.makedirs(spill, exist_ok=True)
con.execute(f"SET temp_directory='{spill}'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    path = f"{sf_dir}/{t}.parquet"
    # driver testdata is one file per table; Spark-written (e.g. tmp/sf1)
    # is a directory of part files — glob in that case
    if Path(path).is_dir():
        path = f"{path}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

oracle = json.loads(Path(sql_path).read_text())
times = {}
errors = {}
for name, sql in sorted(oracle.items()):
    runs = []
    try:
        for _ in range(2):  # min of 2, same hygiene as graft.Bench
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
    except Exception as e:  # one pathological query must not kill the file
        errors[name] = f"{type(e).__name__}: {e}"[:200]
        print(f"[oracle_bench] {name} FAILED: {errors[name]}", file=sys.stderr)
        continue
    times[name] = round(min(runs), 6)

# A spike can also land MID-run (it did): check again before writing.
# The check must be DECAY-AWARE: this script's own 32-thread run drives
# the 1-minute load to ~threads-used while it lasts (with multi-second
# oracles like the BPE family, ~18 on a 32-core host), so an absolute
# post-run threshold rejects every healthy recording. Self-load decays
# e-fold per minute once the run ends; an external process still running
# does not. Poll for decay, refuse only if load STAYS high.
MAX_LOAD_AFTER = float(os.environ.get("ORACLE_BENCH_MAX_LOAD_AFTER", "4.5"))
DECAY_WAIT = int(os.environ.get("ORACLE_BENCH_DECAY_WAIT_SEC", "300"))
waited = 0
while os.getloadavg()[0] > MAX_LOAD_AFTER and waited < DECAY_WAIT:
    time.sleep(15)
    waited += 15
if os.getloadavg()[0] > MAX_LOAD_AFTER:
    sys.exit(f"[oracle_bench] load still {os.getloadavg()[0]:.2f} "
             f"{DECAY_WAIT}s after the run — an external workload is "
             "active, refusing to write")
# stamp THIS load — the one the decay gate accepted. Sampling again
# after the probe replays re-measures our own 32-thread probe work and
# stamps a number above the gate (r9 committed 5.46 > 4.5 that way),
# making a clean recording read as a contaminated one.
load_at_gate = round(os.getloadavg()[0], 2)

# Decay can't distinguish a transient external spike that ENDED mid-run
# from our own (ended) work, so validate by reproducibility: replay the
# largest sub-second queries once on the now-quiet host. A recorded time
# a spike INFLATED (the dangerous direction — it flatters every
# downstream vs_oracle ratio) replays much faster; a still-noisy host
# replays much slower. Refuse on either.
probes = [n for n, s in sorted(times.items(), key=lambda kv: -kv[1])
          if times[n] < 1.0][:3]
for name in probes:
    # min of 2, SAME hygiene as the recording loop: after the decay
    # wait the host has idled for minutes and a single-shot replay
    # absorbs CPU ramp-up / cold-state effects the recording never paid
    # (measured 1.8× on an otherwise-idle host at sf1) — that is probe
    # noise, not contamination
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(oracle[name]).fetchall()
        runs.append(time.perf_counter() - t0)
    replay = min(runs)
    lo, hi = times[name] / 1.6 - 0.05, max(0.15, 1.6 * times[name])
    if not (lo <= replay <= hi):
        sys.exit(f"[oracle_bench] probe {name} replayed at {replay:.3f}s vs "
                 f"recorded {times[name]:.3f}s — recorded times are "
                 "contaminated, refusing to write")

out = {
    "_meta": {
        # absolute: a cwd-relative path (r9's "tmp/sf1") is not
        # reproducible from the artifact alone
        "sf_dir": str(Path(sf_dir).resolve()),
        "recorded_unix": int(time.time()),
        "load_avg": load_at_gate,
        "duckdb": duckdb.__version__,
        "threads": os.cpu_count(),
        "errors": errors,
    },
    "times": times,
}
Path(out_path).write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
print(f"wrote {out_path}: {len(times)} queries, "
      f"total {sum(times.values()):.2f}s, load {out['_meta']['load_avg']}")
