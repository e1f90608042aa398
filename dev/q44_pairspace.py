#!/usr/bin/env python3
"""Semantic pair-space audit for q44's decade curve (SCALE.md).

q44's shuffle bytes are gated for linearity across sf0.1/sf1/sf10
(devtools.ScaleDecade). The pair expansion's size is NOT a plan
choice: the query is DEFINED to emit every same-(lang,source) doc
pair sharing a bigram with df <= 50, so sum_{df<=50} C(df,2) is the
semantic lower bound of the exchange. This script computes, per rung:

  posting_rows  distinct (lang, source, bg, doc) rows  (the ONE
                grouped shuffle that builds the posting lists)
  live_pairs    sum C(df,2) over bigrams with df <= maxDf (the pair
                rows the in-row expansion must emit)
  dropped_bg    bigrams over the cap (skew the cap removed)

If measured shuffle bytes track posting_rows + live_pairs, the plan
is at its semantic minimum and any curve shape is the DATA's (the
df-cap transition window filling up), not a plan defect.

Usage: python3 dev/q44_pairspace.py [dir ...]
"""
import sys

import duckdb

MAXDF = 50

dirs = sys.argv[1:] or [
    "/root/testdata/sf0.1", "/root/repo/tmp/sf1", "/root/repo/tmp/sf10"]

con = duckdb.connect()
con.execute("SET threads=16")
print(f"{'rung':24} {'posting_rows':>14} {'live_pairs':>14} "
      f"{'dropped_bg':>12} {'live_bg':>12}")
for d in dirs:
    row = con.execute(f"""
      WITH toks AS (
        SELECT doc_id, lang, source,
               string_split_regex(text, '\\s+') AS tk
        FROM read_parquet('{d}/documents.parquet')),
      bg AS (
        SELECT DISTINCT doc_id, lang, source,
               tk[i] || ' ' || tk[i+1] AS bg
        FROM toks, LATERAL (
          SELECT unnest(range(1, len(tk))) AS i)
        WHERE len(tk) >= 2),
      df AS (
        SELECT lang, source, bg, COUNT(*) AS df
        FROM bg GROUP BY 1, 2, 3)
      SELECT
        (SELECT COUNT(*) FROM bg)                         AS posting_rows,
        SUM(CASE WHEN df <= {MAXDF}
                 THEN df * (df - 1) // 2 ELSE 0 END)      AS live_pairs,
        SUM(CASE WHEN df > {MAXDF} THEN 1 ELSE 0 END)     AS dropped_bg,
        SUM(CASE WHEN df <= {MAXDF} THEN 1 ELSE 0 END)    AS live_bg
      FROM df""").fetchone()
    print(f"{d:24} {row[0]:>14,} {row[1]:>14,} {row[2]:>12,} {row[3]:>12,}")
