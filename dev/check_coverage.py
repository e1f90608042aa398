#!/usr/bin/env python3
"""Cross-check COVERAGE.md's query references against the real catalog.

Stale doc claims are a recorded recurring bug class (a COVERAGE.md row
naming a query that was renamed/removed, or a new query never mapped to
its SURVEY row). This check makes the drift mechanical:

  1. every `qNN_full_name` token in COVERAGE.md must be a query that
     graft.Verify actually dumped (i.e. exists in SparkEntry.queries);
  2. every short `qNN` reference must prefix-match at least one real
     query;
  3. every real query must be referenced somewhere in COVERAGE.md
     (full name or short prefix) — new operators may not ship
     undocumented.

Usage: python3 dev/check_coverage.py <verify_out_dir> [coverage_md]
The verify out dir (run_verify.sh's $OUT) provides the authoritative
query list: one dump directory per SparkEntry.queries entry.
"""
import os
import re
import sys


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
    cov_path = sys.argv[2] if len(sys.argv) > 2 else "COVERAGE.md"
    queries = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)) and re.match(r"q\d+", d)
    )
    if not queries:
        print(f"check_coverage: no query dumps under {out_dir}", file=sys.stderr)
        return 2
    with open(cov_path, encoding="utf-8") as f:
        cov = f.read()
    refs = set(re.findall(r"\bq\d+[a-z0-9_]*\b", cov))
    full_refs = {r for r in refs if "_" in r}
    short_refs = {r for r in refs if "_" not in r}
    qset = set(queries)
    errors = []
    for r in sorted(full_refs - qset):
        errors.append(f"COVERAGE.md names '{r}' but no such query exists")
    for r in sorted(short_refs):
        if not any(q == r or q.startswith(r + "_") for q in qset):
            errors.append(f"COVERAGE.md names '{r}' but no query matches it")
    for q in queries:
        short = q.split("_", 1)[0]
        if q not in full_refs and short not in short_refs:
            errors.append(f"query '{q}' has no COVERAGE.md reference")
    if errors:
        for e in errors:
            print(f"check_coverage: {e}", file=sys.stderr)
        print(f"check_coverage: {len(errors)} stale reference(s)", file=sys.stderr)
        return 1
    print(f"check_coverage: {len(queries)} queries <-> COVERAGE.md consistent")
    return 0


if __name__ == "__main__":
    sys.exit(main())
