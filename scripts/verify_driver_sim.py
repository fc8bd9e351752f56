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


def kind(s: pd.Series) -> str:
    """Coarse dtype class that determines how a value stringifies."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Stringify WITHOUT dtype unification — mirrors the driver's value
    hash, which stringifies cells as-is.  An int64 254 vs float64 254.0
    must MISMATCH here, exactly as it does in the driver (the r04
    HUGEINT-vs-BIGINT gap was invisible to the old dtype-normalizing
    compare)."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            # one canonical float width so equal VALUES stringify equally;
            # float-vs-int stays visible because ints never enter here
            out[c] = s.astype("float64").astype(str)
        else:
            out[c] = s.astype(str)
    df = pd.DataFrame(out)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


qs = E.queries()
oracles = E.oracle_sql()
only = sys.argv[1:]  # optional subset of query ids

# Oracle output-type lint (DESCRIBE only — nothing executes): HUGEINT /
# UHUGEINT / DECIMAL columns turn into float64 in pandas and stringify
# with a trailing '.0', diverging from Spark's int even when values are
# identical.  This is the r04 q_tpch_q12 / q_pack_sequences bug class —
# reject it statically for every registered oracle, not just the slate.
_BAD_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")
lint_fails = []
# full runs lint every registered oracle; subset runs lint only the
# selected ids (DESCRIBE of the heavy nested oracles costs seconds each —
# the registry-wide static check still gates every full run)
for name, sql in oracles.items():
    if only and name not in only:
        continue
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        lint_fails.append((name, f"describe-error {repr(e)[:120]}"))
        continue
    bad = [(c, t) for c, t, *_ in desc if any(b in t.upper() for b in _BAD_DUCK_TYPES)]
    if bad:
        lint_fails.append((name, f"pandas-float-prone oracle columns {bad}"))
for name, why in lint_fails:
    print(f"MARKER LINT {name}: {why}", flush=True)
assert not lint_fails, f"oracle type lint failed: {[n for n, _ in lint_fails]}"
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
            gp = got.toPandas()
            wp = con.execute(sql).df()
            # dtype-identity gate: the driver hashes stringified values, so
            # an int column on one side and a float on the other diverges
            # even when every value is numerically equal (r04: DuckDB
            # HUGEINT sum -> pandas float64 '254.0' vs Spark bigint '254')
            # datetime-vs-object is allowed: Spark DATE comes back as
            # object(datetime.date) while DuckDB date_trunc gives
            # datetime64 — both stringify to '2024-01-15' for midnight
            # values (these ids pass the real driver), and any real value
            # difference is still caught by the exact string compare.
            kdiff = [
                (c, kind(gp[c]), kind(wp[c]))
                for c in sorted(set(gp.columns) & set(wp.columns))
                if kind(gp[c]) != kind(wp[c])
                and {kind(gp[c]), kind(wp[c])} != {"datetime", "object"}
            ]
            assert not kdiff, f"dtype-kind mismatch spark-vs-oracle: {kdiff}"
            g = normalize(gp)
            w = normalize(wp)
            assert list(g.columns) == list(w.columns), f"schema {list(g.columns)} vs {list(w.columns)}"
            assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
            # visibility (not a failure): IEEE -0.0 in either engine's
            # stringified output.  Spark's BigDecimal round never emits
            # it, DuckDB round and numpy round preserve it — a rounded
            # sign-indefinite column showing -0.0 here is one seed away
            # from a driver hash mismatch (add '+ 0' to the oracle and,
            # for pandas-backed operators, '+ 0.0' to the Python side).
            nz = [
                c
                for c in g.columns
                if (g[c] == "-0.0").any() or (w[c] == "-0.0").any()
            ]
            if nz:
                print(f"MARKER NEGZERO {name}: columns {nz}", flush=True)
            pd.testing.assert_frame_equal(g, w, check_exact=True)
            status = f"pass rows={len(g)}"
    except Exception as e:
        fails.append(name)
        status = "FAIL " + repr(e)[:300]
        traceback.print_exc(limit=3)
    print(f"MARKER [{i+1}/{len(qs)}] {name}: {status}", flush=True)
print(f"MARKER SUMMARY checked={len(only) or len(qs)} elapsed={time.time()-t0:.0f}s fails={fails}", flush=True)
