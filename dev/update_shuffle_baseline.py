#!/usr/bin/env python3
"""Regenerate dev/shuffle_baseline.json AND dev/time_baseline.json
from a bench stderr log.

Usage: run the bench capturing stderr, then feed the log:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=1 \
      java ... graft.Bench 2> /tmp/bench_stderr.log
    python3 dev/update_shuffle_baseline.py /tmp/bench_stderr.log

The shuffle baseline records per-query shuffle-write MB at sf0.1;
Bench flags any query whose measured value exceeds
baseline * 1.25 + 1 MB (plan-determined, load-independent).

The time baseline records per-query min seconds from the same
accepted run; Bench self-adjudicates (isolated min-of-5 re-run) any
query whose in-suite min exceeds baseline * 1.35 + 0.3 s
(load-dependent counterpart). Only refresh both from a run you have
inspected and accepted — a polluted run written as baseline would
mask real regressions (shuffle) or adjudicate everything (time).
"""
import json
import re
import sys

log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_stderr.log"
out = sys.argv[2] if len(sys.argv) > 2 else "dev/shuffle_baseline.json"
time_out = sys.argv[3] if len(sys.argv) > 3 else "dev/time_baseline.json"

pat = re.compile(r"\[bench\] (\S+) reps=\S+ min=([0-9.]+) max=[0-9.]+"
                 r"(?: shuffle_mb=([0-9.]+))?")
# the sf1 scale subset's lines: "[bench] sf1 <q> reps=... min=..."
sf1_pat = re.compile(r"\[bench\] sf1 (\S+) reps=\S+ min=([0-9.]+)")
shuffle, times, sf1_times = {}, {}, {}
skipped_failed = []
with open(log) as f:
    for line in f:
        m1 = sf1_pat.search(line)
        if m1:
            if "FAILED-REPS" in line:
                skipped_failed.append("sf1:" + m1.group(1))
                continue
            sf1_times[m1.group(1)] = float(m1.group(2))
            continue
        m = pat.search(line)
        if m:
            # a FAILED-REPS line's min is time-to-crash, not cost —
            # never bake it into either accepted baseline
            if "FAILED-REPS" in line:
                skipped_failed.append(m.group(1))
                continue
            times[m.group(1)] = float(m.group(2))
            if m.group(3) is not None:
                shuffle[m.group(1)] = float(m.group(3))
if skipped_failed:
    print(f"skipped {len(skipped_failed)} FAILED-REPS queries: "
          + ", ".join(skipped_failed[:8]))

if not times and not sf1_times:
    sys.exit(f"no [bench] min= lines found in {log}")


def merge_write(path, fresh, what):
    """MERGE-update the baseline: entries present in the log replace
    their old values, entries absent from the log are KEPT. A subset
    bench run (graft.Bench takes query-name args for dev iteration)
    must never shrink the baseline — a shrunken time baseline would
    silently disable clock adjudication for every dropped query."""
    import os
    old = {}
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
    merged = dict(old)
    merged.update(fresh)
    stale = sorted(set(old) - set(fresh))
    with open(path, "w") as f:
        json.dump(dict(sorted(merged.items())), f, indent=1)
    print(f"wrote {len(merged)} {what} entries to {path} "
          f"({len(fresh)} refreshed from log, {len(stale)} kept from "
          f"the previous baseline)")
    if stale and len(fresh) >= len(old):
        print(f"  note: possibly-stale entries not in this full-sized "
              f"log (renamed/removed queries?): {', '.join(stale[:8])}"
              + (" ..." if len(stale) > 8 else ""))


if shuffle:
    merge_write(out, shuffle, "shuffle-MB")
else:
    print("no shuffle_mb values in log (metrics off?); "
          f"left {out} untouched")

if times:
    merge_write(time_out, times, "time")

# sf1 scale baseline (same merge discipline; gate = *1.35 + 0.3 s)
if sf1_times:
    merge_write("dev/time_baseline_sf1.json", sf1_times, "sf1-time")
