#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables and compare (column-sorted,
row-sorted, exact values) against the parquet Verify wrote.

Usage: python3 dev/check.py [sfDir] [outDir]
"""
import sys, json, math
import duckdb
import os
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file tables; GenScale output
        # (tmp/sf1) is Spark-written directories — glob those
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # the names Verify ATTEMPTED this run (absent file = legacy dump,
    # assume everything was requested): a requested query with no
    # output dir FAILED spark-side or silently wrote nothing — that
    # must fail the gate. Unrequested names (dev subset runs) are
    # skipped BEFORE executing the oracle — running all the oracle
    # SQLs at sf1 to then report "missing" burns hours for nothing.
    req_path = f"{outdir}/requested.json"
    if os.path.exists(req_path):
        req = json.load(open(req_path))
        requested, full_run = set(req["names"]), req["full"]
    else:
        requested, full_run = set(oracle), True
    ok = fail = 0
    skipped = 0
    for name in sorted(oracle):
        if full_run and name not in requested:
            # an oracle entry with no catalog query is a wiring bug —
            # on a full run nothing can legitimately be unrequested
            print(f"FAIL {name}: oracle entry has no catalog query")
            fail += 1
            continue
        if not os.path.isdir(f"{outdir}/{name}"):
            if name in requested:
                print(f"FAIL {name}: requested but no spark output written")
                fail += 1
            else:
                skipped += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: missing spark output: {e}")
            fail += 1
            continue
        r = compare(name, exp, got)
        if r:
            ok += 1
        else:
            fail += 1
    # requested queries WITHOUT an oracle entry (the documented
    # "non-SQL-expressible" class) still get a PRESENCE check: a
    # crashed query writes nothing and Verify swallows the throw, so
    # without this loop it would vanish from the gate entirely
    rows_only = 0
    for name in sorted(requested - set(oracle)):
        if os.path.isdir(f"{outdir}/{name}"):
            rows_only += 1
        else:
            print(f"FAIL {name}: requested (no oracle) but no spark output written")
            fail += 1
    extra = f" ({skipped} absent outputs skipped)" if skipped else ""
    if rows_only:
        extra += f" ({rows_only} oracle-less outputs present, rows-only)"
    print(f"\n{ok} ok, {fail} fail{extra}")
    sys.exit(1 if fail else 0)

def compare(name, exp, got):
    ecols, gcols = sorted(exp.columns), sorted(got.columns)
    if ecols != gcols:
        print(f"FAIL {name}: columns differ: spark={gcols} oracle={ecols}")
        return False
    exp = exp.reindex(ecols, axis=1)
    got = got.reindex(gcols, axis=1)
    if len(exp) != len(got):
        print(f"FAIL {name}: row count spark={len(got)} oracle={len(exp)}")
        return False
    key = list(exp.columns)
    exp = exp.sort_values(by=key, na_position="first").reset_index(drop=True)
    got = got.sort_values(by=key, na_position="first").reset_index(drop=True)
    bad = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        if str(e.dtype) != str(g.dtype):
            bad.append(f"{c}: dtype spark={g.dtype} oracle={e.dtype}")
            continue
        # Exact equality for ALL dtypes including floats: the engine's
        # determinism contract is bit-identical results (COVERAGE.md
        # "Cross-engine determinism"), so no float tolerance on purpose.
        neq = ~((e == g) | (e.isna() & g.isna()))
        n = int(neq.sum())
        if n:
            i = neq.idxmax()
            bad.append(f"{c}: {n} rows differ, first at {i}: spark={got[c][i]!r} oracle={exp[c][i]!r}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad[:4]))
        return False
    print(f"ok   {name} ({len(exp)} rows)")
    return True

if __name__ == "__main__":
    main()
