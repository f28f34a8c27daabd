"""Local replica of the driver's DuckDB-oracle differential check.

Runs every catalog query on Spark and its oracle SQL on DuckDB at sf0.01,
compares row count, column-name set, and an order-insensitive row
multiset. Floats are compared exactly first; any nonzero diff is
reported with its magnitude so the query can be restructured to emit
deterministic values (the driver's hash tolerance is unknown — bit-equal
is the only safe target).

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(rows: list[tuple], cols: list[str], naive_is_local: bool = False):
    """Order-insensitive canonical form: sort columns by name, then rows.

    ``naive_is_local``: naive datetimes from PySpark's non-Arrow collect()
    are SYSTEM-local wall times (fromtimestamp), DuckDB's are UTC wall
    times — canonicalize each to epoch micros so the comparison holds on
    any host timezone (same convention as tools/driver_harness.py).
    """
    import datetime as _dt

    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def canon(v):
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            return ("f", v)
        if isinstance(v, bool):
            return ("b", v)
        if v is None:
            return ("n",)
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None or naive_is_local:
                epoch = v.timestamp()
            else:
                epoch = v.replace(tzinfo=_dt.timezone.utc).timestamp()
            return ("ts", str(int(epoch * 1_000_000)))
        return (type(v).__name__, str(v))

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def schema_diff(s_tbl, d_tbl) -> list[str]:
    """Compare the engines' *declared* Arrow result schemas by column name.

    Python-object comparison can't see that DuckDB returned HUGEINT where
    Spark returned BIGINT (both surface as ``int``), but the driver's value
    hash does — this is exactly what broke f9_json_extract/a6_insight_summary
    in round 1. Width/kind mismatches are hard failures; timezone/string-width
    differences are cosmetic at the hash layer and only warned.
    """
    import pyarrow as pa

    def canon(t: pa.DataType):
        # utf8 vs large_utf8, ts timezone annotations: cosmetic.
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        if pa.types.is_timestamp(t):
            return f"timestamp[{t.unit}]"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return f"list<{canon(t.value_type)}>"
        if pa.types.is_decimal(t):
            return f"decimal({t.precision},{t.scale})"
        return str(t)

    s_fields = {f.name: canon(f.type) for f in s_tbl.schema}
    d_fields = {f.name: canon(f.type) for f in d_tbl.schema}
    problems = []
    for name in sorted(set(s_fields) & set(d_fields)):
        if s_fields[name] != d_fields[name]:
            problems.append(
                f"type[{name}] spark={s_fields[name]} duck={d_fields[name]}"
            )
    return problems


def float_diff(a_rows, b_rows) -> float:
    """Max abs diff between matched float positions after sorting; inf when
    shapes differ."""
    if len(a_rows) != len(b_rows):
        return float("inf")
    worst = 0.0
    for ra, rb in zip(a_rows, b_rows):
        if len(ra) != len(rb):
            return float("inf")
        for va, vb in zip(ra, rb):
            if va[0] == "f" and vb[0] == "f" and va[1] != "nan" and vb[1] != "nan":
                worst = max(worst, abs(va[1] - vb[1]))
            elif va != vb:
                return float("inf")
    return worst


def main() -> int:
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.session import get_spark

    registry = catalog_all()
    wanted = sys.argv[1:] or list(registry)
    spark = get_spark(app_name="check_oracle", shuffle_partitions=8)
    con = duck_con()
    failures = []
    for name in wanted:
        spec = registry[name]
        if spec.oracle is None:
            t0 = time.time()
            n = spec.builder(spark, SF_DIR).count()
            print(f"{name:32s} ROWS-ONLY rows={n} ({time.time()-t0:.1f}s)")
            continue
        t0 = time.time()
        try:
            sdf = spec.builder(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"{name:32s} SPARK-ERROR {str(e)[:200]}")
            failures.append(name)
            continue
        try:
            d = con.sql(spec.oracle)
            d_cols = d.columns
            d_rows = d.fetchall()
        except Exception as e:
            print(f"{name:32s} ORACLE-ERROR {str(e)[:200]}")
            failures.append(name)
            continue
        problems = []
        try:
            problems += schema_diff(
                sdf.limit(0).toArrow(),
                con.sql(f"SELECT * FROM ({spec.oracle}) LIMIT 0").arrow(),
            )
        except Exception as e:  # Arrow path optional (e.g. exotic types)
            print(f"{name:32s} (arrow-schema check skipped: {str(e)[:120]})")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            a = normalize(s_rows, s_cols, naive_is_local=True)
            b = normalize(d_rows, d_cols)
            if a != b:
                fd = float_diff(a, b)
                if fd == 0.0:
                    problems.append("rows differ (non-float)")
                elif fd == float("inf"):
                    ex = next((x, y) for x, y in zip(a, b) if x != y)
                    problems.append(f"rows differ, e.g. {ex[0][:4]} vs {ex[1][:4]}")
                else:
                    problems.append(f"float diff max={fd:.3e}")
        status = "OK" if not problems else "FAIL"
        print(f"{name:32s} {status} rows={len(s_rows)} ({time.time()-t0:.1f}s)"
              + ("" if not problems else "  " + "; ".join(problems)[:300]))
        if problems:
            failures.append(name)
    print(f"\n{len(wanted) - len(failures)}/{len(wanted)} OK; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
