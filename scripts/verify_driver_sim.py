"""Driver simulation: vanilla session, t1 smoke, t2 DuckDB-oracle compare at sf0.01.

Set SPARK_GRAFT_SIM_SF to point the compare at alternative testdata
(e.g. seed-fuzzed tables from scripts/fuzz_testdata.py)."""
import os, sys, time, traceback

sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# t1 smoke
df = E.entry(spark)
n = len(df.collect())
print(f"MARKER T1 rows={n} schema={[c for c, _ in df.dtypes]}", flush=True)
assert n >= 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


qs = E.queries()
oracles = E.oracle_sql()
only = sys.argv[1:]  # optional subset of query ids
fails = []
t0 = time.time()
for i, (name, fn) in enumerate(qs.items()):
    if only and name not in only:
        continue
    try:
        got = fn(spark, SF)
        sql = oracles.get(name)
        if sql is None:
            cnt = got.count()
            assert cnt >= 0 and len(got.columns) > 0
            status = f"rows-only rows={cnt}"
        else:
            g = normalize(got.toPandas())
            w = normalize(con.execute(sql).df())
            assert list(g.columns) == list(w.columns), f"schema {list(g.columns)} vs {list(w.columns)}"
            assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            status = f"pass rows={len(g)}"
    except Exception as e:
        fails.append(name)
        status = "FAIL " + repr(e)[:300]
        traceback.print_exc(limit=3)
    print(f"MARKER [{i+1}/{len(qs)}] {name}: {status}", flush=True)
print(f"MARKER SUMMARY checked={len(only) or len(qs)} elapsed={time.time()-t0:.0f}s fails={fails}", flush=True)
