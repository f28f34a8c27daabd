"""Scale probe: does per-query cost grow like the data, or like the plan?

Replicates the sf0.1 fixture tables N× into a scratch dir with each
replica's key space SHIFTED (surrogate keys offset by replica index ×
key stride), so every join keeps its single-copy selectivity — output
cardinalities grow N×, never N². Dimension tables that joins fan out
through by VALUE (region, nation) are left at one copy.

Then times a headline-query subset at 1× and N× and prints one JSON
line per scale with per-query seconds. The interesting read-out is the
RATIO column: a floor-bound query (broadcast star joins) should grow
far slower than N; a per-row-cost query (dedup, text stats) should
approach N — that is the evidence the plans amortize, which is what a
1000-executor 100 TB deployment buys.

Usage: python tools/scale_probe.py [N] [scratch_dir]
       (defaults: N=8, scratch=/tmp/spark_graft_scale)

Paired mode (round-6, VERDICT r5 #3): ``--paired [N ...]`` times the
perf-watch queries INTERLEAVED against DuckDB on the SAME replica data
at each scale, in one session — the question it answers is whether the
sf0.1 spark/duck ratio (floor-dominated on sub-second queries) falls
toward <=2x as data grows, i.e. whether the gap is the local[32]
scheduling floor amortizing away (fine at 100 TB) or a real plan
problem (not fine). DuckDB reads the replica parquet directories via
glob views; tracked Spark caches are released after every run (same
fairness contract as bench.py).

Usage: python tools/scale_probe.py --paired [N ...] [--scratch dir]
       (default N list: 8 32)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# key columns to shift per replica; stride chosen >> max key in sf0.1
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["region", "nation"]
STRIDE = 100_000_000

PROBE_QUERIES = [
    "flagship_star_pivot",   # floor-bound: all-broadcast star
    "q17_small_qty_share",   # decorrelated agg + broadcast probe
    "a4_q1_pricing_summary", # map-side partial agg
    "d2_dedup_by_key",       # per-row: one full shuffle of lineitem
    "u6_text_stats",         # per-row: text exprs over documents
    "st4_session_window",    # per-row: session windows over events
    "j7_dpp_busiest_year",   # DPP: partition-pruned scan of the 8x copy
    "u6_chunk_documents",    # per-row: token-window fan-out (explode)
    "q21_waiting_supplier",  # heaviest decorrelation: semi+anti over the fact
    "llm_curation_funnel",   # compute-bound composed text pass
    "etl_scd2_dim",          # per-key history: three windows on one shuffle
    "a25_incremental_agg",   # O(delta) refresh: partial-merge aggregation
    "q23_market_basket",     # orderkey-keyed self-join: pairs bounded by basket size
    "d3_ngram_jaccard_capped",  # inverted-index similarity join, DF-capped
    "d3_jaccard_prefix",     # prefix-filtered similarity join (lossless)
    "u10_tfidf_topterms",    # row-local tf + vocab-broadcast df (round-4 shape)
    "u6_token_entropy",      # zero-shuffle closed-form entropy (round-4 shape)
    "d3_simhash_pairs",      # multi-index banded hamming join (round-5 shape;
                             # r10: contract grade — adds the identical-text
                             # dup join + completeness checks to the timed leg)
    "d3_minhash_pairs_capped",  # capped LSH join + shared-index report (round-5)
    "sample_stratified_mix_hash",  # content-hash coins: narrow, no shuffle (round-5)
    "d3_shared_span_pairs",  # winnowed fingerprint index + span equi-join (round-6)
    "u6_bpe_pairs",          # word-histogram collapse + vocab-sized pair agg (round-6)
    "u6_repeated_ngrams",    # narrow n-gram windows + one n-gram-keyed shuffle (round-6)
    "d3_line_dedup",         # segment doc-freq + ordered reassembly (round-6)
    "llm_dsir_select",       # vocab-sized two-LM agg + per-doc regroup (round-6)
    "u9_triangle_count",     # canonical-edge two-hop equi-join (round-6)
    "llm_corpus_drift",      # vocab-sized conditional-sum agg (round-6)
    "st7_trending_topk",     # windowed counts + key-domain rank (round-6)
    "sample_weighted_es",    # ES weighted top-k: TakeOrdered, no shuffle (round-6b)
    "a36_kmv_quantiles",     # bottom-k-hash sketch + k-row percentile (round-6b)
    "llm_curriculum_order",  # two distributed global_rank passes (round-6b)
    "a37_winsorize",         # two grouped passes + broadcast band (round-6b)
    "llm_mixture_temperature",  # one grouped pass + source-frame window (round-6b)
    "j10_bloom_semi_reduction",  # literal-bloom probe filter + semi join (round-6c)
    "u11_trigram_backoff",   # 3 n-gram-keyed aggs + broadcast lookups (round-6c)
    "llm_quality_classifier",  # zero-shuffle hashed-linear scan (round-6c)
    "a40_kmv_setops",        # distinct + TakeOrdered bottom-k sketches (round-6c)
    "t7_ohlc_bars",          # one-shuffle min_by/max_by OHLC rollup (round-6c)
    "w12_user_paths",        # WindowGroupLimit prefix + path agg (round-6c)
    "u6_readability",        # zero-shuffle row-local FRE scoring (round-6c)
    "d3_containment_pairs",  # directed shingle-index join; ~linear like
                             # d3_jaccard_prefix (10.8x at 8x = the 9.27x
                             # saturated-cores band, round-3 note)
    "d3_minhash_md5",        # md5-coin LSH: row-local fold + band join (r7)
    "j11_salted_skew_join",  # 16-way salted hot-key join (r7)
    "t8_resample_interp",    # grid union + two frame windows per type (r7)
    "w13_rolling_median",    # holistic 5-row frame median per user (r7)
    "w14_rolling_zscore",    # exact-cents frame power sums (r7)
    "a41_spearman_corr",     # two rank windows + one grouped agg (r7)
    "a43_grouped_mad",       # two grouped percentile passes (r7)
    "u6_vocab_coverage",     # token explode + broadcast vocab (r7)
    "llm_hard_negatives",    # broadcast-query brute-force scoring (r7)
    "llm_dataset_card",      # one-scan multi-distinct Expand (r7)
    "a44_gini_customer_value",  # rank window + closed-form fold (r8)
    "a45_hhi_concentration",    # one grouped pass + squared-share fold (r8)
    "a46_ks_two_sample",        # two CDF windows over the value domain (r8)
    "a47_benford_deviation",    # first-digit histogram, one grouped pass (r8)
    "a48_autocorrelation",      # daily-series power sums, lag joins (r8)
    "a49_mann_whitney",         # distinct-domain tie ranks + rank-sum (r8)
    "w15_ewma_smooth",          # 8-tap lag chain over daily sums (r8)
    "j15_band_join",            # eps-bin explode + hash equi-join (r8)
    "llm_pii_scrub",            # row-local regex chains, zero shuffle (r8)
    "u7_radius_search",         # scan+filter threshold search (r8)
    "u6_url_normalize",         # row-local URL canonicalization (r8)
    "a50_survival_km",          # one custkey shuffle + tenure-domain window (r8)
    "a51_bootstrap_ci",         # 32x fan-out collapsed map-side to 32 partials (r8)
    "u7_int8_ann",              # broadcast queries x quantized corpus scan (r8)
    "a52_decayed_counts",       # daily-count groupBy + day-domain fold (r8)
    "llm_quantile_normalize",   # (source,value)-domain ranks + join-back (r8)
    "d3_simhash_md5",           # row-local 60-bit fold + 4-band equi-join (r8)
    "u9_pagerank_nations",      # 12 fixed join+groupBy rounds on the pair graph (r8)
    "a53_conversion_ztest",     # user-keyed groupBy + 2-row fold (r8)
    "t11_skyline_pareto",       # price-cell groupBy + domain running max (r8)
    "a54_funnel_gated",         # three shrinking user-keyed stages (r8)
    "a55_seasonal_decompose",   # daily groupBy + day-domain MA frames (r8)
    "u6_kwic_snippets",         # row-local tokenize+slice, zero exchanges (r8)
    "a56_mann_kendall",         # day-domain pair join + 1-row stats (r8)
    "a57_backtest_mape",        # daily groupBy + calendar self-join (r8)
    "u7_ivf_int8_topk",         # routed quantized-list scoring + contract mirror (r8)
    "w16_pattern_vshape",       # day-domain lag/lead pattern window (r8)
    "llm_preference_pairs",     # two source-partition rank windows + rank join (r8)
    "d4c_bag_setops",           # two grouped counts + key-domain join (r8)
    "t12_diversified_topk",     # per-source cap + survivor-frame rank (r8)
    "u6_shingle_novelty",       # shingle-domain spread counts + source fold (r8)
    "w17_rolling_corr",         # integer frame sums over the day domain (r8)
    "u9_clustering_coeff",      # wedge self-join on the node-domain edge list (r8)
    # d3_semdedup is NOT probed here: its catalog entry fixes k=16, and
    # Σ|cluster|² at fixed k grows quadratically BY CONSTRUCTION — the
    # scale contract is k ∝ n (constant n/k); that experiment lives in
    # BASELINE.md §semdedup (21k vs 42k Zipf vectors at constant n/k).
]


def build_replicas(spark, out_dir: str, n: int) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    par = spark.sparkContext.defaultParallelism
    for name in SINGLE_COPY:
        df = spark.read.parquet(f"{SF_DIR}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    for name, keys in SHIFT.items():
        df = spark.read.parquet(f"{SF_DIR}/{name}.parquet")
        copies = []
        for i in range(n):
            c = df
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * STRIDE)).cast(df.schema[k].dataType))
            if name == "documents" and i > 0:
                # The text analog of key-shifting: suffix every token with
                # the replica id so replicas share ZERO shingles. Verbatim
                # copies would make each doc an exact dup of its n-1
                # replicas — similarity self-join output grows n² (the 8×
                # probe showed 54× on the prefix join) and DF caps
                # silently drop everything, neither of which measures the
                # intended n×-rows-same-structure scaling.
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1x{i}")
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        # spread across files so the N× scan parallelizes like real data
        out.repartition(min(par, 4 * n)).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )


def probe_names() -> list[str]:
    """PROBE_QUERIES, optionally narrowed via SPARK_GRAFT_PROBE_ONLY
    (comma-separated names) for probing just the shapes a change touched."""
    only = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
    if not only:
        return PROBE_QUERIES
    names = [n.strip() for n in only.split(",") if n.strip()]
    unknown = [n for n in names if n not in PROBE_QUERIES]
    if unknown:
        raise SystemExit(f"not in PROBE_QUERIES: {unknown}")
    return names


def time_probe(spark, registry, sf_dir: str, runs: int = 3) -> dict[str, float]:
    out = {}
    for name in probe_names():
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            registry[name].builder(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        out[name] = round(sorted(samples)[runs // 2], 3)
    return out


# The five queries the round-5 verdict marked perf-watch (each >2x DuckDB
# at sf0.1 with an audited-canonical plan), plus u10 which joined the set
# when the cache-fairness fix made its timed runs pay materialization.
PAIRED_QUERIES = [
    "d2_dedup_by_key",
    "q21_waiting_supplier",
    "etl_scd2_dim",
    "u10_tfidf_topterms",
    "d3_exact_dedup",
]

TABLES = list(SHIFT) + SINGLE_COPY


def _duck_con(sf_dir: str, plain: bool):
    """DuckDB connection with the ten tables viewed over ``sf_dir``.
    ``plain``: fixture dirs hold single files ``t.parquet``; replica dirs
    hold Spark-written directories ``t.parquet/*.parquet``."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet" if plain else f"{sf_dir}/{t}.parquet/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def paired_probe(
    spark,
    registry,
    sf_dir: str,
    plain: bool,
    n_timed: int = 2,
    queries: list[str] | None = None,
) -> dict:
    from praw_etl_student_dropout_spark.plans.cache_registry import (
        release_session_caches,
    )

    con = _duck_con(sf_dir, plain)
    spark_s, duck_s = {}, {}
    for name in queries or PAIRED_QUERIES:
        spec = registry[name]
        spec.builder(spark, sf_dir).count()  # warm-up
        release_session_caches()
        if spec.oracle is not None:
            con.sql(spec.oracle).fetchall()
        st, dt = [], []
        for _ in range(n_timed):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).count()
            st.append(time.perf_counter() - t0)
            release_session_caches()
            if spec.oracle is not None:
                t0 = time.perf_counter()
                con.sql(spec.oracle).fetchall()
                dt.append(time.perf_counter() - t0)
        spark_s[name] = round(min(st), 3)
        duck_s[name] = round(min(dt), 3) if dt else None
        ratio = f"{spark_s[name] / duck_s[name]:.2f}" if dt else "n/a (rows-only)"
        print(
            f"# {name}: spark={spark_s[name]:.3f}s "
            f"duckdb={duck_s[name] if dt else 'n/a'} ratio={ratio}",
            file=sys.stderr,
        )
    con.close()
    return {
        "spark_s": spark_s,
        "duckdb_s": duck_s,
        "ratio": {
            q: round(spark_s[q] / duck_s[q], 2)
            for q in spark_s
            if duck_s[q]
        },
    }


def main_paired(scales: list[int], scratch: str, queries: list[str] | None = None) -> None:
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_paired")
    spark.sparkContext.setLogLevel("ERROR")
    registry = catalog_all()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()  # JVM warm
    out = {"queries": queries or PAIRED_QUERIES, "scales": {}}
    out["scales"]["1"] = paired_probe(spark, registry, SF_DIR, plain=True, queries=queries)
    for n in scales:
        d = f"{scratch}_{n}x"
        if not os.path.isdir(d):
            print(f"# building {n}x replicas in {d}", file=sys.stderr)
            build_replicas(spark, d, n)
        out["scales"][str(n)] = paired_probe(spark, registry, d, plain=False, queries=queries)
    print(json.dumps(out))


def main() -> None:
    if "--paired" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--paired"]
        scratch = "/tmp/spark_graft_scale"
        if "--scratch" in args:
            i = args.index("--scratch")
            scratch = args[i + 1]
            del args[i : i + 2]
        queries = None
        if "--queries" in args:
            # Probe exactly the named catalog entries (comma-separated) —
            # for re-legging a single shape after a targeted fix.
            i = args.index("--queries")
            queries = [q.strip() for q in args[i + 1].split(",") if q.strip()]
            del args[i : i + 2]
        if "--headline" in args:
            # VERDICT r7 #3: pair the FULL bench headline set, not just
            # the perf-watch five — rows-only entries time Spark-only.
            args.remove("--headline")
            import bench

            queries = list(bench.HEADLINE)
        scales = [int(a) for a in args] or [8, 32]
        main_paired(scales, scratch, queries)
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale"
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    registry = catalog_all()
    build_replicas(spark, scratch, n)
    base = time_probe(spark, registry, SF_DIR)
    scaled = time_probe(spark, registry, scratch)
    ratios = {q: round(scaled[q] / base[q], 2) for q in base}
    print(json.dumps({"n": n, "base_s": base, "scaled_s": scaled, "ratio": ratios}))


if __name__ == "__main__":
    main()
