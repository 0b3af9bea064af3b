#!/usr/bin/env python3
"""Replay SparkEntry oracle SQL in DuckDB against an arbitrary SF dir and
compare to a Verify dump — the driver's correctness gate, runnable at sf1.

Usage: oracle_spotcheck.py <sfDir> <verifyOutDir> <resultJson> [query ...]

Mirrors the driver's compare: columns sorted by name, rows sorted by all
columns, values hashed canonically (floats rounded to 9 significant
digits so float64 repr jitter doesn't fail a numerically-equal result).
Driver-side tooling only (python/duckdb are not available to the engine).
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


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


def table_of(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols = [cols[i] for i in order]
    rows = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return cols, rows


def main():
    sf_dir, out_dir, result_path = sys.argv[1], sys.argv[2], sys.argv[3]
    wanted = sys.argv[4:]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if wanted:
        oracles = {k: v for k, v in oracles.items() if k in wanted}

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    results = {}
    for name in sorted(oracles):
        entry = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        try:
            s_cols, s_rows = table_of(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            entry["spark_rows"] = len(s_rows)
            o_cols, o_rows = table_of(con, oracles[name])
            entry["oracle_rows"] = len(o_rows)
            entry["rows_match"] = len(s_rows) == len(o_rows)
            entry["schema_match"] = s_cols == o_cols
            entry["hash_match"] = s_rows == o_rows
            if not entry["hash_match"] and entry["rows_match"]:
                bad = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
                entry["err"] = (f"{len(bad)} differing rows; first at {bad[0]}: "
                                f"spark={s_rows[bad[0]]} oracle={o_rows[bad[0]]}"
                                ) if bad else None
        except Exception as e:  # noqa: BLE001 — report, keep going
            entry["err"] = f"{type(e).__name__}: {e}"
        results[name] = entry
        ok = entry["hash_match"] and entry["schema_match"]
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"spark_rows={entry['spark_rows']} oracle_rows={entry['oracle_rows']}"
              + (f" err={entry['err']}" if entry["err"] else ""))

    with open(result_path, "w") as f:
        json.dump(results, f, indent=2)
    if not all(r["hash_match"] and r["schema_match"] for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
