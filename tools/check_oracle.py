#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate:
run Verify's oracle_sql.json in DuckDB over the fixture parquet,
compare against the Spark result parquet (columns sorted by name,
values hashed row-by-row).

TYPE-STRICT like the driver: values keep their python type in the hash
(DuckDB HUGEINT/DECIMAL128 SUM vs Spark BIGINT is a FAIL even when
values are numerically equal), doubles compare bitwise (no .10g
rounding), and list-typed columns are flagged because the driver's
pandas row-sort crashes on them (unhashable numpy.ndarray).

Usage: check_oracle.py <sfdir> <verify_out>
"""
import duckdb, json, sys, glob, os, math, struct
import datetime as _dt
import pyarrow as pa
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def canon(v):
    """Type-preserving canonical form mirroring the driver's pandas hash:
    floats compare by IEEE bits (no .10g rounding); Decimal('3408') != 3408
    (DuckDB HUGEINT SUM fails against Spark BIGINT); int32 vs int64 both
    become python int (driver passes those); datetimes normalize (pandas
    Timestamp vs datetime are the same datetime64 to the driver)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack("<d", v).hex()
    if isinstance(v, _dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"date:{v.isoformat()}"
    return f"{type(v).__name__}:{v}"


fails = []
for name in sorted(oracle):
    res_dir = f"{outdir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"MISSING  {name}: no spark output")
        fails.append(name)
        continue
    spark_tbl = pa.concat_tables(pq.read_table(f) for f in sorted(files))
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
    # Driver row-sorts through pandas: raw list columns crash it.
    listy = [c for c in scols
             if pa.types.is_list(spark_tbl.schema.field(c).type)
             or pa.types.is_large_list(spark_tbl.schema.field(c).type)
             or pa.types.is_list(duck.schema.field(c).type)
             or pa.types.is_large_list(duck.schema.field(c).type)]
    if listy:
        print(f"ARRAYCOL {name}: list-typed columns {listy} would crash "
              f"the driver's pandas row-sort — stringify them")
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
