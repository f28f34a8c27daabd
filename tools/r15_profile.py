"""Round-15 optimization profiler (guide §1: measure first).

For each headline query (or the names given on argv) this captures, in
one warm session:

- ``explain("formatted")`` → ``plans/r15/<name>_<tag>.txt`` (the judge's
  evidence files; tag defaults to ``before``),
- three timed runs against the NOOP sink (guide §1.4 — times the whole
  computation of every column, isolated from count()'s column pruning),
- three timed runs of the bench's own action (``count()``) for
  continuity with bench.py's methodology,
- the number of Spark jobs one run submits (job-group id census — the
  per-query scheduling-floor multiplier on local mode),
- the Exchange / BroadcastExchange / *EvalPython node counts from the
  formatted plan (the shuffle and Python-boundary shape at a glance).

Prints one JSON line per query and a final summary line.

Usage: python tools/r15_profile.py [--tag before|after] [name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, SF_DIR  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    names = args or list(HEADLINE)

    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.plans.cache_registry import (
        release_session_caches,
    )
    from praw_etl_student_dropout_spark.session import get_spark
    from praw_etl_student_dropout_spark.sources.partitioned import (
        ensure_orders_by_year,
    )
    from praw_etl_student_dropout_spark.sources.readers import load_tables

    registry = catalog_all()
    spark = get_spark(app_name="r15_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    load_tables(spark, SF_DIR)
    ensure_orders_by_year(spark, SF_DIR)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(plans_dir, exist_ok=True)

    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name in names:
        spec = registry[name]
        # Warm-up (codegen JIT for this plan shape), as bench.py does.
        spec.builder(spark, SF_DIR).count()
        release_session_caches()

        # Plan dump comes from a fresh builder call (no cached lineage).
        df = spec.builder(spark, SF_DIR)
        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        release_session_caches()

        n_exchange = len(re.findall(r"\bExchange\b", plan)) - len(
            re.findall(r"BroadcastExchange", plan)
        )
        n_bcast = len(re.findall(r"BroadcastExchange", plan))
        n_py = len(re.findall(r"EvalPython|MapInPandas|MapInArrow", plan))

        # Job census: one counted run inside a dedicated job group.
        group = f"r15prof-{name}"
        sc.setJobGroup(group, name)
        spec.builder(spark, SF_DIR).count()
        sc.setJobGroup(None, None)
        # Runtime-final AQE plan (isFinalPlan=true): the evidence the
        # static dump cannot show — join-strategy re-decisions, stage
        # reuse, AQEShuffleRead coalescing (VERDICT r14 #1: q3's
        # broadcast-side demotion is runtime-only). collect() (not
        # count) so the df's OWN query execution runs with every column.
        try:
            final_df = spec.builder(spark, SF_DIR)
            final_df.collect()
            final_plan = final_df._jdf.queryExecution().executedPlan().toString()
            with open(
                os.path.join(plans_dir, f"{name}_{tag}_runtime.txt"), "w"
            ) as fh:
                fh.write(final_plan)
            release_session_caches()
        except Exception:
            pass
        try:
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        except Exception:
            jobs = -1
        release_session_caches()

        noop_t = []
        for _ in range(3):
            d = spec.builder(spark, SF_DIR)
            t0 = time.perf_counter()
            d.write.format("noop").mode("overwrite").save()
            noop_t.append(time.perf_counter() - t0)
            release_session_caches()
        count_t = []
        for _ in range(3):
            d = spec.builder(spark, SF_DIR)
            t0 = time.perf_counter()
            d.count()
            count_t.append(time.perf_counter() - t0)
            release_session_caches()

        rec = {
            "noop_min_s": round(min(noop_t), 3),
            "count_min_s": round(min(count_t), 3),
            "jobs": jobs,
            "exchanges": n_exchange,
            "broadcasts": n_bcast,
            "python_nodes": n_py,
        }
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)

    total = round(sum(v["count_min_s"] for v in out.values()), 3)
    print(
        json.dumps(
            {"profile_total_count_s": total, "tag": tag, "sf_dir": SF_DIR, "n": len(out)}
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
