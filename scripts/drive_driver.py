"""Simulate the driver: plain SparkSession, sf0.01, side-by-side with DuckDB.

Usage: drive_driver.py [substring ...] — with args, only queries whose
name contains any substring are swept (smoke check still runs).
"""
import sys, math
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb, pandas as pd

spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.ui.enabled","false").getOrCreate())   # NOTE: driver's bare session — no engine configs

import __spark_entry__ as E

# t1 smoke
df = E.entry(spark)
rows = df.collect()
print("SMOKE rows:", len(rows), "schema:", [f.name for f in df.schema])
assert len(rows) > 0

# t2 correctness at sf0.01
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

Q, O = E.queries(), E.oracle_sql()
only = sys.argv[1:]
fails = []
for name in sorted(Q):
    if only and not any(s in name for s in only):
        continue
    try:
        mine = Q[name](spark, sf).toPandas()
        if name not in O:
            print(f"{name}: rows-only, {len(mine)} rows"); continue
        ref = con.execute(O[name]).fetch_df()
        ok_cols = sorted(mine.columns) == sorted(ref.columns)
        ok_rows = len(mine) == len(ref)
        ok_vals = True
        if ok_cols and ok_rows:
            a = mine[sorted(mine.columns)].sort_values(by=sorted(mine.columns), ignore_index=True)
            b = ref[sorted(ref.columns)].sort_values(by=sorted(ref.columns), ignore_index=True)
            for c in a.columns:
                av, bv = a[c], b[c]
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    if not ((av.fillna(0) - bv.fillna(0)).abs().max() <= 1e-9 * (1+bv.abs().max())):
                        ok_vals = False; print(f"  {name}.{c}: max diff {(av-bv).abs().max()}")
                else:
                    def _s(v):
                        try:
                            if pd.isna(v): return "<NULL>"
                        except (TypeError, ValueError): pass
                        return str(v)
                    same = (av.map(_s).values == bv.map(_s).values).all()
                    if not same: ok_vals = False; print(f"  {name}.{c}: value mismatch")
        status = "OK" if (ok_cols and ok_rows and ok_vals) else f"MISMATCH cols={ok_cols} rows={ok_rows} vals={ok_vals}"
        print(f"{name}: {status} ({len(mine)} rows)")
        if status != "OK": fails.append(name)
    except Exception as ex:
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
        fails.append(name)

print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
