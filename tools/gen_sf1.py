#!/usr/bin/env python3
"""Build an sf1 scale point as a 10x key-offset replication of the
driver's sf0.1 tables (the driver's own generator is not shipped).

Design: per-copy structure IDENTICAL to sf0.1 so per-query cost can be
compared against a 10x-linear expectation:

- fact/mid tables: keys offset per copy by a round multiple of 1000
  (keeps `doc_id % 100` bench-slice semantics intact); dimension
  tables region/nation stay fixed (TPC-H convention).
- documents: copy i > 0 suffixes every token with `_c{i}` (n_chars
  recomputed). Token COUNTS — and so the near-dup length-bucket
  blocking — are unchanged, while cross-copy shingle sets are
  disjoint: each copy reproduces sf0.1's planted exact-dup and
  near-dup structure exactly, and the corpus-wide length distribution
  matches a real 10x corpus (bucket occupancy x10). That makes the
  exact-Jaccard candidate count grow ~quadratically BY CONSTRUCTION —
  the honest property of length blocking at scale, measured against
  the MinHash-LSH path which stays ~linear.
- embeddings: identical vectors, labels offset per copy -> the
  label-blocked near-dup join scales linearly.
- events: event_id/user_id offset, timestamps unchanged (hourly
  rollup keys constant, per-key counts scale).

Usage: python3 tools/gen_sf1.py [OUT_DIR] [COPIES]
       (defaults /tmp/graft-sf1, 10 — COPIES=100 builds the sf10 point,
        the second genuine scale decade for the growth-exponent table)
"""
import os
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def round_up(n, base=1000):
    return ((n + base) // base) * base


def shift_keys(t, key_offsets, i):
    for col, off in key_offsets.items():
        f = t.schema.field(col)
        idx = t.schema.get_field_index(col)
        t = t.set_column(idx, f, pc.add(t[col], pa.scalar(i * off)).cast(f.type))
    return t


def doc_transform(t, i):
    if i == 0:
        return t
    suf = f"_c{i}"
    texts = [" ".join(tok + suf for tok in s.split(" ")) for s in t["text"].to_pylist()]
    t = t.set_column(t.schema.get_field_index("text"),
                     t.schema.field("text"), pa.array(texts, pa.string()))
    return t.set_column(t.schema.get_field_index("n_chars"),
                        t.schema.field("n_chars"),
                        pa.array([len(s) for s in texts], pa.int64()))


def main():
    os.makedirs(OUT, exist_ok=True)
    plans = {
        "region": {},
        "nation": {},
        "customer": {"c_custkey": None},
        "supplier": {"s_suppkey": None},
        "part": {"p_partkey": None},
        "orders": {"o_orderkey": None, "o_custkey": None},
        "lineitem": {"l_orderkey": None, "l_partkey": None, "l_suppkey": None},
        "events": {"event_id": None, "user_id": None},
        "documents": {"doc_id": None},
        "embeddings": {"vec_id": None, "label": None},
    }
    # foreign keys share the offset of their parent's primary key
    key_sources = {
        "o_custkey": ("customer", "c_custkey"),
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    }
    tables = {name: pq.read_table(f"{SRC}/{name}.parquet") for name in plans}
    offs = {}
    for name, keys in plans.items():
        for col in keys:
            if col not in key_sources:
                offs[(name, col)] = round_up(pc.max(tables[name][col]).as_py())
    for col, (ptab, pcol) in key_sources.items():
        for name in plans:
            if col in plans[name]:
                offs[(name, col)] = offs[(ptab, pcol)]

    for name, keys in plans.items():
        tbl = tables[name]
        if not keys:  # dimension tables stay fixed
            out = tbl
        else:
            ko = {c: offs[(name, c)] for c in keys}
            parts = []
            for i in range(COPIES):
                t = shift_keys(tbl, ko, i)
                if name == "documents":
                    t = doc_transform(t, i)
                parts.append(t)
            out = pa.concat_tables(parts)
        pq.write_table(out, f"{OUT}/{name}.parquet", compression="zstd")
        print(f"{name}: {tbl.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
