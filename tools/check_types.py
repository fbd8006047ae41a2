#!/usr/bin/env python3
"""Type-level twin of check_oracle.py: the driver's correctness hash is
TYPE-sensitive (DuckDB SUM(int) -> HUGEINT/decimal128 vs Spark BIGINT
broke 14 round-1 rows with identical values). For each Verify output,
compare the arrow type of every column between the Spark parquet and the
DuckDB oracle's arrow result."""
import sys, json, glob, os
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
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name}"); fail += 1; continue
    spark_schema = {f.name: f.type for f in pq.read_schema(files[0])}
    try:
        duck = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"SQLERR   {name}: {e}"); fail += 1; continue
    duck_schema = {f.name: f.type for f in duck.schema}
    diffs = []
    for c in sorted(set(spark_schema) | set(duck_schema)):
        a, b = spark_schema.get(c), duck_schema.get(c)
        # The driver hashes Python values (to_pylist): integer widths and
        # timestamp units normalize to the same py objects, but
        # decimal128 -> Decimal != int/float -- that's the class that
        # broke 14 round-1 rows. Flag only diffs that survive Python
        # value equality.
        def cls(t):
            s = str(t).replace(", tz=UTC", "")
            if s.startswith("int") or s.startswith("uint"): return "int"
            if s.startswith("timestamp"): return "ts"
            if s.startswith("float") or s == "double": return "float"
            if s.startswith("decimal"): return "DECIMAL"
            return s
        if cls(a) != cls(b):
            diffs.append(f"{c}: spark={a} duck={b}")
    if diffs:
        fail += 1
        print(f"TYPEDIFF {name}: " + "; ".join(diffs))
    else:
        ok += 1
print(f"\n{ok} ok, {fail} type-diff/err")
sys.exit(1 if fail else 0)
