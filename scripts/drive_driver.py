"""Simulate the driver: plain SparkSession, sf0.01, side-by-side with DuckDB.

Usage: drive_driver.py [substring ...] — with args, only queries whose
name contains any substring are swept (smoke check still runs).
"""
import sys, math, time
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
import os
sf = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

Q, O = E.queries(), E.oracle_sql()
only = sys.argv[1:]
fails = []
for name in Q:  # registration order, like the real driver
    if only and not any(s in name for s in only):
        continue
    t0 = time.perf_counter()
    try:
        mine = Q[name](spark, sf).toPandas()
        el = time.perf_counter() - t0
        if name not in O:
            print(f"{name}: rows-only, {len(mine)} rows [{el:.1f}s]"); continue
        ref = con.execute(O[name]).fetch_df()
        ok_cols = sorted(mine.columns) == sorted(ref.columns)
        ok_rows = len(mine) == len(ref)
        ok_vals = True
        if ok_cols and ok_rows:
            cols = sorted(mine.columns)
            a0, b0 = mine[cols], ref[cols]
            # sort on non-float keys only: near-equal floats (1-ULP engine
            # differences) must not scramble row alignment
            is_f = lambda df, c: df[c].dtype.kind == 'f'
            fcols = [c for c in cols if is_f(a0, c) or is_f(b0, c)]
            # exact columns are the primary sort; floats participate only
            # ROUNDED and last, so rows tied on all exact keys still align
            # but a 1-ULP engine diff can't flip the order
            def _sorted(df):
                aug = df.copy()
                for c in fcols:
                    aug[f"__r_{c}"] = pd.to_numeric(df[c], errors="coerce").round(6)
                keys = [c for c in cols if c not in fcols] + [f"__r_{c}" for c in fcols]
                return aug.sort_values(by=keys, ignore_index=True)[cols]
            a = _sorted(a0)
            b = _sorted(b0)
            for c in cols:
                av, bv = a[c], b[c]
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    if not (av.isna() == bv.isna()).all():  # NULL vs 0.0 is a real diff
                        ok_vals = False; print(f"  {name}.{c}: null-mask mismatch")
                    # 1e-12: the real driver red-flagged q62 at ~3e-10
                    # relative (cent-level), while engine-identical
                    # expressions sit at <=1e-15 ulp noise (q64/q67/q71,
                    # all driver-green) — 1e-12 separates the two classes.
                    # DRIVER_SIM_EXACT=1 drops the tolerance to BITWISE
                    # equality (stricter than the driver) to flag any
                    # query leaning on float luck rather than the
                    # engineered decimal/fold exactness conventions.
                    elif os.environ.get("DRIVER_SIM_EXACT") == "1":
                        # bitwise via u8 view (after the null-mask check
                        # above): catches -0.0 vs +0.0, which == cannot
                        an = av.fillna(0.0).astype("float64").to_numpy()
                        bn = bv.fillna(0.0).astype("float64").to_numpy()
                        if not (an.view("u8") == bn.view("u8")).all():
                            ok_vals = False; print(f"  {name}.{c}: max diff {(av-bv).abs().max()} (bitwise mode)")
                    elif not ((av.fillna(0) - bv.fillna(0)).abs().max() <= 1e-12 * (1+bv.abs().max())):
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
        print(f"{name}: {status} ({len(mine)} rows) [{el:.1f}s]", flush=True)
        if status != "OK": fails.append(name)
    except Exception as ex:
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]} [{time.perf_counter()-t0:.1f}s]", flush=True)
        fails.append(name)

print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
