#!/usr/bin/env python3
"""Dev harness mirroring the driver's t2 gate: for each Verify output
parquet, replay the oracle SQL in DuckDB on the same sf dir and compare
(column-name-sorted, row-sorted, exact values)."""
import sys, json, glob, os, math, functools
print = functools.partial(print, flush=True)  # progress visible under redirection
import duckdb, pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = ok = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"MISSING  {name} (no spark result)"); fail += 1; continue
    try:
        spark_tbl = pq.read_table(files[0]).to_pylist()
    except Exception as e:
        print(f"READERR  {name}: {e}"); fail += 1; continue
    try:
        cur = con.execute(sql)
        cols = [c[0] for c in cur.description]
        duck_rows = [dict(zip(cols, r)) for r in cur.fetchall()]
    except Exception as e:
        print(f"SQLERR   {name}: {e}"); fail += 1; continue

    def norm(rows):
        out = []
        for r in rows:
            nr = {}
            for k in sorted(r):
                v = r[k]
                if hasattr(v, "isoformat"): v = v.isoformat()
                if isinstance(v, float) and math.isnan(v): v = "NaN"
                nr[k] = v
            out.append(tuple(nr.items()))
        return out  # preserve row order (driver may hash in order)

    a, b = norm(spark_tbl), norm(duck_rows)
    if a == b:
        print(f"OK       {name} ({len(a)} rows)"); ok += 1
    else:
        fail += 1
        print(f"MISMATCH {name}: spark {len(a)} rows vs duck {len(b)} rows")
        sa, sb = set(a), set(b)
        if sa == sb:
            print("         (same set, different ROW ORDER)")
        else:
            for r in list(sa - sb)[:3]: print("   spark-only:", r)
            for r in list(sb - sa)[:3]: print("   duck-only :", r)
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
