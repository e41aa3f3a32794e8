#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate:
run Verify's oracle_sql.json in DuckDB over the fixture parquet,
compare against the Spark result parquet (columns sorted by name,
values hashed row-by-row). Usage: check_oracle.py <sfdir> <verify_out>
"""
import duckdb, json, sys, glob, os, math
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

fails = []
for name in sorted(oracle):
    res_dir = f"{outdir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"MISSING  {name}: no spark output")
        fails.append(name)
        continue
    spark_tbl = pq.read_table(files[0])
    try:
        duck = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"ORACLEERR {name}: {e}")
        fails.append(name)
        continue
    scols, dcols = sorted(spark_tbl.column_names), sorted(duck.column_names)
    if scols != dcols:
        print(f"SCHEMA   {name}: spark={scols} duck={dcols}")
        fails.append(name)
        continue
    if spark_tbl.num_rows != duck.num_rows:
        print(f"ROWS     {name}: spark={spark_tbl.num_rows} duck={duck.num_rows}")
        fails.append(name)
        continue
    sp = spark_tbl.select(scols).to_pylist()
    dk = duck.select(scols).to_pylist()
    bad = 0
    for i, (a, b) in enumerate(zip(sp, dk)):
        ca = [canon(a[c]) for c in scols]
        cb = [canon(b[c]) for c in scols]
        if ca != cb:
            if bad == 0:
                print(f"VALUES   {name} row {i}:\n  spark={ca}\n  duck ={cb}")
            bad += 1
    if bad:
        print(f"VALUES   {name}: {bad}/{len(sp)} rows differ")
        fails.append(name)
    else:
        print(f"OK       {name} ({spark_tbl.num_rows} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
