"""Benchmark harness (SURVEY.md §6, BASELINE.md).

Runs the headline catalog queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The DEFAULT mode is INTERLEAVED (round-5 verdict #6): for EACH query,
alternating engine runs in one invocation — spark, duckdb, spark,
duckdb — so the spark-vs-duckdb ratio comes from the same session and
the same moment under identical machine conditions, instead of two
separately-noisy invocations. One warm-up run per engine per query
(whole-stage-codegen JIT / buffer warmup), then N_TIMED timed runs
each; per-query metric is the min (the steady-state number a warm
cluster sees).

Each query is timed as a full action (count on the result — forces the
whole plan including sinks' shuffles). Legacy single-engine modes:
--spark-only (median-of-5, the pre-r5 methodology) and --duckdb.

Output protocol (round-6, VERDICT r5 #1): the FULL result (including the
per-engine ``duckdb_queries`` dict) is written to ``bench_full.json``
next to this file; stdout gets ONE compact JSON line as the absolute
last line — totals, ratio, and per-query Spark timings only — small
enough to survive a bounded tail capture. Spark console progress bars
are disabled session-wide (session.py) for the same reason.

Cache fairness (round-6, ADVICE r5): queries that persist an owned
intermediate via plans.cache_registry.track (u10's (doc,term,tf) table)
would otherwise serve every timed run from the warm-up's cache while
DuckDB re-executes its full oracle each run. release_session_caches()
now runs after EVERY Spark run — warm-up and timed — so each timed run
pays its own materialization, same as DuckDB does.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# One per operator family — the graded headline set.
HEADLINE = [
    "flagship_star_pivot",
    "doc_sentiment_pivot",
    "a4_q1_pricing_summary",
    "j1_star_join_agg",
    "j4_left_join",
    "w1_topk_per_group",
    "w3_running_sum",
    "t3_global_topk",
    "d2_dedup_by_key",
    "d3_exact_dedup",
    # r10: d3_minhash_pairs became a CONTRACT grade (runs the production
    # capped pipeline PLUS the exact-Jaccard truth it's checked against
    # — a different, heavier shape). The capped md5-coin twin is the
    # same production MinHash+LSH pipeline shape, full-oracle, so the
    # headline trend stays comparable across rounds.
    "d3_minhash_pairs_capped",
    "u7_knn_bruteforce",
    "u6_text_stats",
    "st3_tumbling_window",
    "st4_session_window",
    "j5_asof_join",
    "etl_star_schema",
    "f9_json_extract",
    "a12_percentiles",
    "u5_grouped_udaf",
    "multimodal_features",
    "q3_shipping_priority",
    "q5_region_volume",
    "q17_small_qty_share",
    "q8_market_share",
    "q21_waiting_supplier",
    "j7_dpp_busiest_year",
    "llm_curation_funnel",
    "a25_incremental_agg",
    "etl_scd2_dim",
    "a24_salted_hot_key_agg",
    "u10_tfidf_topterms",
]


def bench_spark() -> dict:
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.session import get_spark

    registry = catalog_all()
    spark = get_spark(app_name="bench")
    # Timing runs only — WARN-level chatter (e.g. WindowExec notes on the
    # tiny post-aggregation dim windows) would drown the per-query lines.
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM + file listing once so per-query numbers measure the
    # query, not session startup; load_tables populates the parquet
    # schema cache so no timed run pays the per-path inference job.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    from praw_etl_student_dropout_spark.sources.readers import load_tables

    load_tables(spark, SF_DIR)
    # One-time scratch materialization (partitioned orders copy) happens
    # outside the timed region — j7 measures DPP, not the layout write.
    from praw_etl_student_dropout_spark.sources.partitioned import ensure_orders_by_year

    ensure_orders_by_year(spark, SF_DIR)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry[name]
        # BASELINE.md methodology: warm cache, median of 5 — the first
        # run of a plan shape pays whole-stage-codegen JIT (often 3-5x
        # the steady state) that a long-lived cluster amortizes away;
        # median-of-3 still let that first run drag the median, which is
        # exactly the r1->r2 'regression' the round-2 verdict flagged.
        from praw_etl_student_dropout_spark.plans.cache_registry import (
            release_session_caches,
        )

        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            df = spec.builder(spark, SF_DIR)
            n = df.count()
            runs.append(time.perf_counter() - t0)
            release_session_caches()  # each run pays its own materialization
        timings[name] = round(sorted(runs)[2], 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
    # Concurrent pass: the same queries submitted from 8 client threads.
    # Sequential totals are dominated by the ~0.2 s/query scheduling floor
    # on local mode; concurrent submission overlaps those floors, which is
    # how a multi-tenant deployment actually runs — the delta quantifies
    # how much of the sequential total is floor, not compute.
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(
            pool.map(
                lambda name: registry[name].builder(spark, SF_DIR).count(), HEADLINE
            )
        )
    concurrent_wall = round(time.perf_counter() - t0, 3)
    print(f"# concurrent (8 threads, 1 run each): {concurrent_wall:.3f}s", file=sys.stderr)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "concurrent_wall_clock": concurrent_wall,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }


def bench_duckdb() -> dict:
    """Reference timings: the same oracle SQL in DuckDB (BASELINE.md)."""
    import duckdb

    from praw_etl_student_dropout_spark.plans import catalog_all

    registry = catalog_all()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    timings = {}
    for name in HEADLINE:
        spec = registry[name]
        if spec.oracle is None:
            continue
        t0 = time.perf_counter()
        con.sql(spec.oracle).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# duckdb {name}: {timings[name]:.3f}s", file=sys.stderr)
    return {
        "metric": "duckdb_oracle_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
    }


# Oracle-backed queries that touch only documents/embeddings — the
# subset `--zipf` runs against the realistic 52k-doc Zipfian corpus
# (tools/gen_zipf_corpus.py; BASELINE.md round-5 section). 10× the
# fixture's document count with a 12k-word vocabulary: the regime where
# per-row compute dominates and Spark's ratio vs DuckDB inverts.
ZIPF_HEADLINE = [
    "llm_curation_funnel",
    "d3_exact_dedup",
    "u6_text_stats",
    "u6_lang_id",
    "u6_quality_score",
    "u10_tfidf_topterms",
    "u8_decontaminate",
    "u7_knn_bruteforce",
    "multimodal_features",
    "sample_hash_split",
    "sample_stratified_mix_hash",
]


def _spark_session_warm():
    """Shared Spark warm-up: session, schema cache, scratch layouts."""
    from praw_etl_student_dropout_spark.session import get_spark
    from praw_etl_student_dropout_spark.sources.partitioned import (
        ensure_orders_by_year,
    )
    from praw_etl_student_dropout_spark.sources.readers import load_tables

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    load_tables(spark, SF_DIR)
    ensure_orders_by_year(spark, SF_DIR)
    return spark


def bench_interleaved(
    n_timed: int = 2,
    headline: list[str] | None = None,
    sf_dir: str | None = None,
    warm: bool = True,
) -> dict:
    """PER-QUERY alternation in one invocation: for each headline query,
    one warm-up run per engine (whole-stage-codegen JIT for that plan
    shape — often 3-5x the steady state, amortized away on a long-lived
    cluster), then spark,duck,spark,duck ... timed runs, min per engine.
    Both engines are measured at the SAME moment under the same machine
    conditions, so the gate ratio can't be skewed by cross-session noise
    or by drift between two separate invocations."""
    import duckdb

    from praw_etl_student_dropout_spark.plans import catalog_all

    def _loadavg() -> float | None:
        try:
            with open("/proc/loadavg") as fh:
                return float(fh.read().split()[0])
        except (OSError, ValueError):
            return None

    # Host-load contamination check (round-13, VERDICT r12 #2): a busy
    # host inflates EVERY slot uniformly (~+15% at loadavg 5-7, measured
    # r12), so the pre/post 1-minute load averages are recorded with the
    # reading. A ratio regression whose loadavg_start is well above the
    # idle protocol's <0.5 threshold is the host talking, not the plans.
    load_start = _loadavg()
    headline = headline or HEADLINE
    sf_dir = sf_dir or SF_DIR
    registry = catalog_all()
    if warm:
        spark = _spark_session_warm()
    else:
        from praw_etl_student_dropout_spark.session import get_spark

        spark = get_spark(app_name="bench")
        spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from praw_etl_student_dropout_spark.plans.cache_registry import (
        release_session_caches,
    )

    spark_t: dict[str, list[float]] = {}
    duck_t: dict[str, list[float]] = {}
    for name in headline:
        spec = registry[name]
        registry[name].builder(spark, sf_dir).count()  # spark warm-up
        release_session_caches()  # timed runs must not inherit this cache
        if spec.oracle is not None:
            con.sql(spec.oracle).fetchall()  # duckdb warm-up
        for _ in range(n_timed):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).count()
            spark_t.setdefault(name, []).append(time.perf_counter() - t0)
            # Each timed Spark run pays its own tracked-persist
            # materialization, exactly as each DuckDB run re-executes the
            # full oracle (ADVICE r5 fairness fix).
            release_session_caches()
            if spec.oracle is not None:
                t0 = time.perf_counter()
                con.sql(spec.oracle).fetchall()
                duck_t.setdefault(name, []).append(time.perf_counter() - t0)

    queries = {n: round(min(v), 3) for n, v in spark_t.items()}
    dqueries = {n: round(min(v), 3) for n, v in duck_t.items()}
    comparable_spark = round(sum(queries[n] for n in dqueries), 3)
    duck_total = round(sum(dqueries.values()), 3)
    ratio = round(comparable_spark / duck_total, 3) if duck_total else None
    # Session-noise band (round-11 VERDICT #6): the headline ratio uses
    # per-query MINs; the band re-derives it from the per-query
    # best/worst timed runs on BOTH engines, bounding what any single
    # same-session reading could have reported. A driver reading inside
    # [lo, hi] is the documented ±30%-per-query noise talking, not a
    # plan change; outside it, investigate.
    noise_band = None
    if duck_total:
        # All four band inputs are UNROUNDED per-query sums (ADVICE r12:
        # mixing the rounded headline numerator with unrounded extremes
        # made the endpoints inconsistently derived); only the final two
        # band values are rounded.
        spark_best = sum(min(spark_t[n]) for n in dqueries)
        spark_worst = sum(max(spark_t[n]) for n in dqueries)
        duck_best = sum(min(v) for v in duck_t.values())
        duck_worst = sum(max(v) for v in duck_t.values())
        noise_band = [round(spark_best / duck_worst, 3), round(spark_worst / duck_best, 3)]
    # Cross-round comparability guard (round-10 VERDICT #4): the r10
    # slot swap put d3_minhash_pairs_capped INTO the comparable set
    # while the slot it replaced (d3_minhash_pairs, then rows-only) was
    # EXCLUDED from both totals through r9 — so the headline ratio
    # jumped 1.466 -> 1.56 purely from slot composition. Report the
    # ratio over the r9-comparable slot set (the swapped slot removed
    # from BOTH sides) so the trend line stays apples-to-apples.
    swapped = "d3_minhash_pairs_capped"
    r9_ratio = None
    if swapped in dqueries and duck_total:
        r9_spark = comparable_spark - queries[swapped]
        r9_duck = duck_total - dqueries[swapped]
        r9_ratio = round(r9_spark / r9_duck, 3) if r9_duck else None
    for n in sorted(queries):
        d = f" duckdb={dqueries[n]:.3f}s" if n in dqueries else " (rows-only)"
        print(f"# {n}: spark={queries[n]:.3f}s{d}", file=sys.stderr)

    # Concurrent pass (metric continuity with pre-r5 benches): the same
    # queries submitted from 8 client threads — overlapping the per-query
    # scheduling floor the way a multi-tenant deployment does. The delta
    # vs the sequential total quantifies how much of that total is floor.
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(
            pool.map(
                lambda name: registry[name].builder(spark, sf_dir).count(), headline
            )
        )
    concurrent_wall = round(time.perf_counter() - t0, 3)
    print(f"# concurrent (8 threads, 1 run each): {concurrent_wall:.3f}s", file=sys.stderr)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "concurrent_wall_clock": concurrent_wall,
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "duckdb_queries": dqueries,
        "duckdb_comparable_total": duck_total,
        "spark_comparable_total": comparable_spark,
        "spark_vs_duckdb_ratio": ratio,
        "noise_band": noise_band,
        "r9_comparable_slots_ratio": r9_ratio,
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
        "methodology": f"interleaved per-query, 1 warmup + {n_timed} timed per engine, min per query",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }


def bench_zipf() -> dict:
    """The text/LLM headline subset on the realistic Zipfian corpus
    (52k docs, 12k vocab — tools/gen_zipf_corpus.py), interleaved vs
    DuckDB on the same parquet. This is the regime a 100 TB curation
    deployment lives in: per-row compute dominates the scheduling floor."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.gen_zipf_corpus import ensure_corpus

    zipf_dir = ensure_corpus()
    result = bench_interleaved(
        n_timed=2, headline=ZIPF_HEADLINE, sf_dir=zipf_dir, warm=False
    )
    result["metric"] = "zipf_corpus_text_queries_wall_clock"
    result["sf"] = "zipf-52k"
    return result


if __name__ == "__main__":
    if "--duckdb" in sys.argv:
        result = bench_duckdb()
    elif "--spark-only" in sys.argv:
        result = bench_spark()
    elif "--zipf" in sys.argv:
        result = bench_zipf()
    else:
        result = bench_interleaved()
        # Contamination gate (r13 VERDICT #8): BENCH_r13 started at
        # loadavg 9.34 and its ratio was only interpretable via the
        # noise-band argument. If the host was busy when the timed runs
        # began, WARN, wait (bounded) for the load to settle, and re-run
        # once — the settled reading becomes the headline and the
        # contaminated one is kept alongside for per-slot attribution.
        start = result.get("loadavg_start")
        if start is not None and start > 2.0:
            print(
                f"# WARN loadavg_start={start} > 2.0 — host busy; "
                "waiting (<=240s) for decay, then one settled re-run",
                file=sys.stderr,
            )
            deadline = time.time() + 240
            while time.time() < deadline:
                try:
                    with open("/proc/loadavg") as fh:
                        if float(fh.read().split()[0]) < 1.5:
                            break
                except (OSError, ValueError):
                    break
                time.sleep(15)
            contaminated = result
            result = bench_interleaved()
            result["contaminated_run"] = {
                k: contaminated.get(k)
                for k in (
                    "value", "spark_vs_duckdb_ratio",
                    "duckdb_comparable_total", "loadavg_start",
                    "loadavg_end", "queries",
                )
            }
    # Full detail (per-engine query dicts, methodology) goes to a file;
    # stdout gets one COMPACT line as the absolute last output so a
    # bounded tail capture always sees a complete, parseable JSON object
    # (VERDICT r5 #1: BENCH_r05 was truncated mid-line).
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_full.json"), "w") as f:
        json.dump(result, f, indent=2)
    summary = {
        k: v
        for k, v in result.items()
        if k
        in (
            "metric", "value", "unit", "queries", "sf",
            "duckdb_comparable_total", "spark_comparable_total",
            "spark_vs_duckdb_ratio", "noise_band",
            "r9_comparable_slots_ratio", "concurrent_wall_clock",
            "loadavg_start", "loadavg_end", "contaminated_run",
        )
    }
    sys.stderr.flush()
    sys.stdout.flush()
    print(json.dumps(summary, separators=(",", ":")), flush=True)
