#!/usr/bin/env python3
"""Scale-replay gate for the FULL weekly product (devtools.WeeklyScale):
run each section's oracle SQL in DuckDB over the SAME parquet facts the
Spark run read, and compare against the Spark-written result EXACTLY.

Unlike dev/check.py's pandas row-sort (fine at sf0.01, hopeless on
millions of 50-column SUB rows), the compare runs inside DuckDB:
column sets, row counts, and EXCEPT ALL in both directions (bag
equality; SQL set ops treat NULLs as not-distinct, matching the
engine's null semantics). Exact values, floats included — the
determinism contract is bit-identical results.

Usage: python3 dev/check_weekly.py [outDir]
"""
import sys, json, os
import duckdb

def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_weekly_scale"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name in oracle:
        if only and name not in only:
            continue
        spark_glob = f"{outdir}/{name}/*.parquet"
        if not os.path.isdir(f"{outdir}/{name}"):
            print(f"FAIL {name}: no spark output")
            fail += 1
            continue
        try:
            con.sql(f"CREATE OR REPLACE VIEW got AS SELECT * FROM read_parquet('{spark_glob}')")
            con.sql(f"CREATE OR REPLACE VIEW exp AS ({oracle[name]})")
            gcols = [r[0] for r in con.sql("DESCRIBE got").fetchall()]
            ecols = [r[0] for r in con.sql("DESCRIBE exp").fetchall()]
            if sorted(gcols) != sorted(ecols):
                print(f"FAIL {name}: columns differ spark={sorted(gcols)} oracle={sorted(ecols)}")
                fail += 1
                continue
            cols = ", ".join(f'"{c}"' for c in sorted(gcols))
            ng = con.sql("SELECT count(*) FROM got").fetchone()[0]
            ne = con.sql("SELECT count(*) FROM exp").fetchone()[0]
            if ng != ne:
                print(f"FAIL {name}: rows spark={ng} oracle={ne}")
                fail += 1
                continue
            d1 = con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM exp EXCEPT ALL SELECT {cols} FROM got)").fetchone()[0]
            d2 = con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM got EXCEPT ALL SELECT {cols} FROM exp)").fetchone()[0]
            if d1 or d2:
                ex = con.sql(f"SELECT {cols} FROM exp EXCEPT ALL SELECT {cols} FROM got LIMIT 2").fetchall() if d1 else []
                gx = con.sql(f"SELECT {cols} FROM got EXCEPT ALL SELECT {cols} FROM exp LIMIT 2").fetchall() if d2 else []
                print(f"FAIL {name}: {d1} rows oracle-only, {d2} rows spark-only; "
                      f"oracle-only sample={ex} spark-only sample={gx}")
                fail += 1
                continue
            # order-invariant content digest for the SCALE.md record
            dig = con.sql(
                f"SELECT to_hex(bit_xor(hash(CAST(ROW({cols}) AS VARCHAR)))) FROM got"
            ).fetchone()[0]
            print(f"ok   {name} ({ng} rows, digest {dig})")
            ok += 1
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
