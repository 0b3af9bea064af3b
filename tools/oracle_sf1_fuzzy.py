#!/usr/bin/env python3
"""sf1 oracle for q_dedup_fuzzy via an exact FastSS replay in DuckDB.

Why not oracle_spotcheck.py: the committed oracle SQL verifies the
edit-distance-<=1 pair set brute-force (all pairs within a length band,
levenshtein each). Titles are fixed-width 40-char prefixes, so the band
prunes almost nothing and sf1 is ~1.25e11 levenshtein(40,40) calls —
centuries in DuckDB. The brute replay stays the gate at sf0.01/sf0.1.

What replaces it here: the deletion-neighborhood theorem the engine's
own blocking rests on (Bocek/Hunt/Stiller/Hecht, "Fast Similarity
Search in Large Dictionaries", 2007), INDEPENDENTLY re-derived in SQL:
for k=1, d(a,b) <= 1 implies a and b share a variant in
{self} UNION {single-position deletions} —
  d=0: share self; d=1 substitution at i: both i-deletions equal;
  d=1 indel: the shorter title IS a deletion variant of the longer
  and also its own self-variant.
Candidates sharing a variant are then verified with DuckDB's native
levenshtein, so the final pair set is EXACT (the neighborhood only
bounds completeness; precision comes from the verify step). This is
the same two-step the engine runs, but executed by a different engine
from an independent SQL derivation — the verify step never trusts the
blocking.

Usage: oracle_sf1_fuzzy.py <sf1Dir> <verifySf1OutDir> <resultJson>
"""
import json
import sys

import duckdb

FASTSS_SQL = """
WITH t AS (
  SELECT doc_id,
         lower(substr(regexp_replace(text, '\\s+', ' ', 'g'), 1, 40)) AS title
  FROM documents WHERE text IS NOT NULL),
d AS (
  SELECT doc_id, title,
         unnest(generate_series(0, length(title) - 1)) AS i
  FROM t),
v AS (
  SELECT doc_id, title, title AS variant FROM t
  UNION ALL
  SELECT doc_id, title,
         substr(title, 1, i) || substr(title, i + 2) AS variant
  FROM d),
c AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.title AS ta,
                  b.doc_id AS doc_b, b.title AS tb
  FROM v a JOIN v b ON a.variant = b.variant AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(levenshtein(ta, tb) AS INTEGER) AS dist
FROM c WHERE levenshtein(ta, tb) <= 1
ORDER BY doc_a, doc_b
"""


def main():
    sf_dir, out_dir, result_path = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, "tools")
    from oracle_spotcheck import table_of

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")

    s_cols, s_rows = table_of(
        con, f"SELECT * FROM read_parquet('{out_dir}/q_dedup_fuzzy/*.parquet')")
    o_cols, o_rows = table_of(con, FASTSS_SQL)
    entry = {
        "rows_match": len(s_rows) == len(o_rows),
        "schema_match": s_cols == o_cols,
        "hash_match": s_rows == o_rows,
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
        "err": None,
        "method": "FastSS deletion-neighborhood candidates + native "
                  "levenshtein verify (exact; brute-force replay is "
                  "O(n^2 L^2) at sf1)",
    }
    ok = entry["hash_match"] and entry["schema_match"]
    print(f"{'PASS' if ok else 'FAIL'} q_dedup_fuzzy "
          f"spark_rows={entry['spark_rows']} oracle_rows={entry['oracle_rows']}")
    with open(result_path, "w") as f:
        json.dump({"q_dedup_fuzzy": entry}, f, indent=2)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
