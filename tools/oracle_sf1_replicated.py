#!/usr/bin/env python3
"""sf1 oracle for the near-dup dedup family via the generator's
replication law — exact ground truth at a cost the brute-force DuckDB
replay cannot meet.

Why not oracle_spotcheck.py: the committed oracle SQL for
q_dedup_jaccard_pairs / q_dedup_components / q_corpus_build verifies
candidates by brute-force list_intersect over length-bucket joins.
At sf1 bucket occupancy is 10x sf0.1, candidate volume ~100x, and the
measured sf0.1 cost is ~120 s single-threaded-bound in DuckDB
(PRAGMA threads does not help this plan) -> ~3h PER query at sf1.

What replaces it: tools/gen_sf1.py builds sf1 as 10 key-offset copies
of sf0.1 where copy i > 0 suffixes every document token with `_c{i}`.
Consequences, by construction:

  1. cross-copy 3-shingle sets are DISJOINT (every shingle of a copy-i
     doc carries the _c{i} suffix on each token), so cross-copy
     Jaccard is exactly 0 < 0.5: the TRUE sf1 near-dup pair set is
     the sf0.1 pair set replicated per copy with doc_ids offset;
  2. the pair GRAPH is therefore 10 disjoint offset-isomorphic copies,
     so connected components replicate the same way (component id =
     per-copy min doc_id = sf0.1 component id + offset);
  3. exact-dup fingerprints never collide across copies (text differs
     by suffix), token counts and languages are copy-invariant, and
     copy offsets are multiples of 1000 so the `doc_id % 100`
     decontamination slice is copy-invariant -> the corpus-build
     census replicates as n_docs x10, total_tokens x10 per language.

So the EXACT expected sf1 result derives from the DuckDB sf0.1 oracle
result (which this script re-runs live — the committed SQL, not a
cached artifact) expanded by the offset law. The comparison against
the Spark sf1 dump uses the same canon/sort/hash logic as the
driver's gate. This is a true independent oracle: the expectation
comes from DuckDB + the generator's algebra, never from the engine
under test.

Usage: oracle_sf1_replicated.py <sf01Dir> <sf1Dir> <verifySf1OutDir> <resultJson>
"""
import json
import math
import sys

import duckdb

COPIES = 10


def round_up(n, base=1000):
    # must match tools/gen_sf1.py
    return ((n + base) // base) * base


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return format(v, ".9g")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_of(cols, raw_rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out_cols = [cols[i] for i in order]
    rows = sorted(tuple(canon(r[i]) for i in order) for r in raw_rows)
    return out_cols, rows


def spark_table(con, path):
    rel = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')")
    return table_of(list(rel.columns), rel.fetchall())


def main():
    sf01_dir, sf1_dir, out_dir, result_path = sys.argv[1:5]

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf01_dir}/documents.parquet')"
    )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    # the per-copy doc_id offset gen_sf1.py applied
    max_id = con.sql("SELECT max(doc_id) FROM documents").fetchone()[0]
    step = round_up(max_id)
    offsets = [i * step for i in range(COPIES)]

    # sanity-pin the law's premises against the actual sf1 tables
    sf1_max, sf1_n = duckdb.sql(
        f"SELECT max(doc_id), count(*) FROM read_parquet('{sf1_dir}/documents.parquet')"
    ).fetchone()
    n01 = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert sf1_n == COPIES * n01, f"sf1 doc count {sf1_n} != {COPIES}x{n01}"
    assert sf1_max == offsets[-1] + max_id, "offset law mismatch vs sf1 data"

    results = {}

    def compare(name, expected_cols, expected_raw, method):
        cols, rows = table_of(expected_cols, expected_raw)
        s_cols, s_rows = spark_table(con, f"{out_dir}/{name}")
        entry = {
            "rows_match": len(s_rows) == len(rows),
            "schema_match": s_cols == cols,
            "hash_match": s_rows == rows,
            "spark_rows": len(s_rows),
            "oracle_rows": len(rows),
            "err": None,
            "method": method,
        }
        if not entry["hash_match"] and entry["rows_match"]:
            bad = [i for i, (a, b) in enumerate(zip(s_rows, rows)) if a != b]
            if bad:
                entry["err"] = (f"{len(bad)} differing rows; first at {bad[0]}: "
                                f"spark={s_rows[bad[0]]} oracle={rows[bad[0]]}")
        results[name] = entry
        ok = entry["hash_match"] and entry["schema_match"]
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"spark_rows={entry['spark_rows']} oracle_rows={entry['oracle_rows']}"
              + (f" err={entry['err']}" if entry["err"] else ""))

    method = ("duckdb sf0.1 oracle SQL x copy-offset replication law "
              f"(gen_sf1.py: {COPIES} copies, step {step}, disjoint "
              "cross-copy shingles => zero cross-copy near-dup pairs)")

    # --- q_dedup_jaccard_pairs: replicate pairs with both ids offset ---
    rel = con.sql(oracles["q_dedup_jaccard_pairs"])
    cols01 = list(rel.columns)
    rows01 = rel.fetchall()
    ia, ib = cols01.index("doc_a"), cols01.index("doc_b")
    expected = [
        tuple(r[j] + off if j in (ia, ib) else r[j] for j in range(len(r)))
        for off in offsets for r in rows01
    ]
    compare("q_dedup_jaccard_pairs", cols01, expected, method)

    # --- q_dedup_components: replicate (doc_id, component) offset-wise ---
    rel = con.sql(oracles["q_dedup_components"])
    cols01 = list(rel.columns)
    rows01 = rel.fetchall()
    idx = {c: i for i, c in enumerate(cols01)}
    expected = [
        tuple(r[j] + off if j in (idx["doc_id"], idx["component"]) else r[j]
              for j in range(len(r)))
        for off in offsets for r in rows01
    ]
    compare("q_dedup_components", cols01, expected, method)

    # --- q_dedup_cluster_split: split census scales x COPIES ---
    # cluster id = per-copy min doc_id = sf0.1 cluster + offset, and the
    # offsets are multiples of 1000, so cluster % 10 (the split rule) is
    # copy-invariant: every copied cluster lands in the SAME split.
    assert all(off % 10 == 0 for off in offsets), "split law needs 10|offset"
    rel = con.sql(oracles["q_dedup_cluster_split"])
    cols01 = list(rel.columns)
    rows01 = rel.fetchall()
    idx = {c: i for i, c in enumerate(cols01)}
    expected = [
        tuple(r[j] * COPIES if j in (idx["n_clusters"], idx["n_docs"]) else r[j]
              for j in range(len(r)))
        for r in rows01
    ]
    compare("q_dedup_cluster_split", cols01, expected, method)

    # --- q_corpus_build: per-language census scales x COPIES ---
    rel = con.sql(oracles["q_corpus_build"])
    cols01 = list(rel.columns)
    rows01 = rel.fetchall()
    idx = {c: i for i, c in enumerate(cols01)}
    expected = [
        tuple(r[j] * COPIES if j in (idx["n_docs"], idx["total_tokens"]) else r[j]
              for j in range(len(r)))
        for r in rows01
    ]
    compare("q_corpus_build", cols01, expected, method)

    with open(result_path, "w") as f:
        json.dump(results, f, indent=2)
    if not all(r["hash_match"] and r["schema_match"] for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
