"""Driver-style verification harness (the verify skill's recipe, saved).

Run FROM A FOREIGN CWD (e.g. /tmp) so executor-import bugs surface:
    cd /tmp && python /root/repo/tools/driver_harness.py <query> [query ...]

Imports ONLY __spark_entry__ like the grading driver, builds a plain
local[8] session with none of the engine confs (exercises _ensure_conf),
runs entry() + each named query against its DuckDB oracle at sf0.01,
and probes schema stability across scale factors and clean bad-path
errors."""
import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

spark = (
    SparkSession.builder.master("local[8]")
    .appName("verify-ntz")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

# 1. entry() smoke
edf = E.entry(spark)
rows = edf.collect()
print(f"entry(): rows={len(rows)} schema={[f.name for f in edf.schema.fields]}")
assert len(rows) > 0

Q = E.queries()
O = E.oracle_sql()


import datetime as _dt


def canon(rows, cols, naive_is_local=False):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None:
                vals.append("\x00null")
            elif isinstance(v, float):
                # round(6) matches the catalog contract: every query that
                # emits floats rounds them to <= 6 decimals ON BOTH
                # ENGINES, so comparing at 6 is exact, not tolerant. A
                # query emitting unrounded floats would need bit-equal
                # comparison here — don't add one without updating this.
                vals.append(f"{round(v, 6):.6f}")
            elif isinstance(v, _dt.datetime):
                # Canonicalize to epoch micros. The naive-datetime tz
                # interpretation differs BY ENGINE: PySpark's non-Arrow
                # collect() builds naive datetimes via the SYSTEM-local
                # fromtimestamp (naive_is_local=True recovers the true
                # epoch via local .timestamp()), while DuckDB returns
                # UTC-naive wall times. Handling each correctly makes the
                # comparison hold under any host TZ, not just UTC.
                if v.tzinfo is not None:
                    epoch = v.timestamp()
                elif naive_is_local:
                    epoch = v.timestamp()  # local interpretation
                else:
                    epoch = v.replace(tzinfo=_dt.timezone.utc).timestamp()
                vals.append(str(int(epoch * 1_000_000)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


fails = []
import sys as _s
names = _s.argv[1:] or ["w2_sessionize"]
if names == ["--all"]:
    names = sorted(Q)
for name in names:
    try:
        sdf = Q[name](spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:
        print(f"{name}: SPARK-ERROR {str(e)[:140]}")
        fails.append(name)
        continue
    if name not in O:
        # rows-only query (no SQL-expressible oracle) — driver records the
        # weaker check; here just assert it runs and returns rows
        print(f"{name}: spark={len(srows)} ROWS-ONLY")
        continue
    rel = con.execute(O[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    ok_cols = sorted(scols) == sorted(ocols)
    ok_vals = canon(srows, scols, naive_is_local=True) == canon(orows, ocols)
    status = "OK" if (ok_cols and ok_vals) else "MISMATCH"
    print(f"{name}: spark={len(srows)} oracle={len(orows)} cols_match={ok_cols} vals_match={ok_vals} {status}")
    if status != "OK":
        fails.append(name)

# 3. schema stability sf0.001 vs sf0.01
s1 = Q["w2_sessionize"](spark, "/root/testdata/sf0.001").schema
s2 = Q["w2_sessionize"](spark, SF).schema
assert s1 == s2, f"schema drift: {s1} vs {s2}"
print("schema stable across sf0.001/sf0.01")

# 4. clean error on bad sf_dir
try:
    Q["w2_sessionize"](spark, "/root/testdata/does-not-exist").collect()
    print("bad sf_dir: NO ERROR (unexpected)")
except Exception as e:
    print(f"bad sf_dir: {type(e).__name__} (clean)")

print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
