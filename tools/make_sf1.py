#!/usr/bin/env python3
"""Build an sf1-scale bench dataset (~6M lineitem rows) as a 10x
key-shifted replication of the driver's read-only sf0.1 tables.

The driver's generator (seed 42) is not available, so sf1 is not "the
generator at sf=1"; it is ten disjoint key-shards of the sf0.1
distribution, which preserves per-key densities and selectivities while
multiplying every fact cardinality by 10 - exactly what the 10x
scale-curve bench needs. Details:

- Fact keys (custkey/orderkey/partkey/suppkey/event_id/user_id/doc_id/
  vec_id) are shifted by k*10^7 per copy k, so joins resolve within a
  copy and group counts grow 10x.
- Dimension tables (region, nation) are NOT replicated (fixed 5/25 rows,
  as in TPC-H), so per-nation/region group sizes grow 10x - the correct
  scaling direction.
- documents: copy 0 keeps the original text; copies 1..9 prefix a copy
  token, making each document a NEAR-duplicate (not exact duplicate) of
  its siblings - a realistic dup-heavy crawl corpus that exercises the
  minhash/CC path at 10x candidate volume.
- events keeps its timestamps (density inside each window grows 10x,
  the realistic direction for streams); user_id/event_id shift.
- Schemas (incl. timestamp[ns] on events.ts) are preserved exactly via
  pyarrow.

Usage: tools/make_sf1.py [out_dir]   (default /tmp/sf1)
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10
SHIFT = 10_000_000

# table -> columns to shift per copy
SHIFT_COLS = {
    "customer": ["c_custkey"],                       # c_nationkey stays (dim)
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],                       # s_nationkey stays (dim)
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]

import os
os.makedirs(OUT, exist_ok=True)

for t in DIMS:
    tbl = pq.read_table(f"{SRC}/{t}.parquet")
    pq.write_table(tbl, f"{OUT}/{t}.parquet")
    print(f"{t}: {tbl.num_rows} rows (dimension, not replicated)")

for t, cols in SHIFT_COLS.items():
    base = pq.read_table(f"{SRC}/{t}.parquet")
    parts = []
    for k in range(COPIES):
        tk = base
        for c in cols:
            i = tk.schema.get_field_index(c)
            shifted = pc.add(tk.column(c), pa.scalar(k * SHIFT, tk.schema.field(c).type))
            tk = tk.set_column(i, tk.schema.field(c), shifted)
        if t == "documents" and k > 0:
            i = tk.schema.get_field_index("text")
            prefixed = pc.binary_join_element_wise(
                pa.array([f"c{k}"] * tk.num_rows, pa.string()),
                tk.column("text").combine_chunks(), " ")
            tk = tk.set_column(i, tk.schema.field("text"), prefixed)
        parts.append(tk)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{OUT}/{t}.parquet")
    print(f"{t}: {base.num_rows} -> {out.num_rows} rows")
print(f"done -> {OUT}")
