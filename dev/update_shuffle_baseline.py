#!/usr/bin/env python3
"""Regenerate dev/shuffle_baseline.json from a bench stderr log.

Usage: run the bench capturing stderr, then feed the log:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=1 \
      java ... graft.Bench 2> /tmp/bench_stderr.log
    python3 dev/update_shuffle_baseline.py /tmp/bench_stderr.log

The baseline records per-query shuffle-write MB at sf0.1; Bench flags
any query whose measured value exceeds baseline * 1.25 + 1 MB.
"""
import json
import re
import sys

log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_stderr.log"
out = sys.argv[2] if len(sys.argv) > 2 else "dev/shuffle_baseline.json"

pat = re.compile(r"\[bench\] (\S+) reps=.* shuffle_mb=([0-9.]+)")
baseline = {}
with open(log) as f:
    for line in f:
        m = pat.search(line)
        if m:
            baseline[m.group(1)] = float(m.group(2))

if not baseline:
    sys.exit(f"no [bench] shuffle_mb lines found in {log}")

with open(out, "w") as f:
    json.dump(dict(sorted(baseline.items())), f, indent=1)
print(f"wrote {len(baseline)} entries to {out}")
