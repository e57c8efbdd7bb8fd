#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle comparison.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Registers each testdata parquet as a view, runs every oracle_sql.json
entry, and compares (schema, rows) against the Spark parquet dumps with
columns sorted by name and rows sorted.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# pin the session zone: Spark runs with spark.sql.session.timeZone=UTC,
# and any oracle that casts TIMESTAMPTZ->TIMESTAMP would otherwise shift
# by the host zone (the driver's own checker may not pin it — oracles
# should ALSO stay in naive-timestamp arithmetic)
con.execute("SET TimeZone='UTC'")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails, passes, skips = [], [], []
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        fails.append((name, "spark output missing"))
        continue
    try:
        ora = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}"))
        continue
    spark = con.sql(
        f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
    ora = ora.reindex(sorted(ora.columns), axis=1)
    spark = spark.reindex(sorted(spark.columns), axis=1)
    if list(ora.columns) != list(spark.columns):
        fails.append((name, f"columns differ: oracle={list(ora.columns)} spark={list(spark.columns)}"))
        continue
    if [str(t) for t in ora.dtypes] != [str(t) for t in spark.dtypes]:
        fails.append((name, f"dtypes differ: oracle={list(map(str, ora.dtypes))} spark={list(map(str, spark.dtypes))}"))
        continue
    o = ora.sort_values(by=list(ora.columns)).reset_index(drop=True)
    s = spark.sort_values(by=list(spark.columns)).reset_index(drop=True)
    if len(o) != len(s):
        fails.append((name, f"row count: oracle={len(o)} spark={len(s)}"))
        continue
    if not o.equals(s):
        neq = (o != s) & ~(o.isna() & s.isna())
        bad = neq.any(axis=1)
        fails.append((name, f"value mismatch in {int(bad.sum())}/{len(o)} rows; first:\noracle:\n{o[bad].head(3)}\nspark:\n{s[bad].head(3)}"))
        continue
    passes.append((name, len(o)))

for name in sorted(set(os.listdir(out_dir)) - set(oracle)
                   - {"oracle_sql.json", "_verify_errors.json"}):
    n = -1
    try:
        n = len(con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
    except Exception:
        pass
    skips.append((name, n))

print(f"PASS {len(passes)}: " + ", ".join(f"{n}({r})" for n, r in passes))
print(f"ROWS-ONLY {len(skips)}: " + ", ".join(f"{n}({r})" for n, r in skips))
print(f"FAIL {len(fails)}:")
for n, msg in fails:
    print(f"--- {n}: {msg}")
sys.exit(1 if fails else 0)
