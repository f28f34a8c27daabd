"""Driver-contract integrity: the __spark_entry__ surface the grader
consumes stays well-formed as the catalog grows."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod


def test_queries_and_oracles_align(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 60
    # every oracle belongs to a query; never an orphan SQL entry
    assert set(oracles) <= set(qs)
    # rows-only ops are the documented exceptions, not accidents
    rows_only = set(qs) - set(oracles)
    assert all(
        any(tag in name for tag in ("lsh", "minhash", "simhash", "ivf", "pq", "approx", "hashed", "llm_", "sample", "sketch", "cms", "bpe_train", "mmr", "semdedup"))
        for name in rows_only
    ), rows_only


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["r_name", "cnt_f", "cnt_o", "cnt_p"]


def test_every_query_builds_a_plan(spark):
    """Analysis-time check for every builder (no execution): catches
    unresolved columns / bad references across the whole catalog fast."""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        df.schema  # forces analysis


def test_hll_sketch_union_within_bounds(spark):
    """Sketch accuracy contract (r8 contract-graded form): the entry
    itself now carries exact_users (value-matched by the oracle) and the
    within_bound flag; this pins the flag TRUE everywhere — including the
    ALL row, whose estimate came through hll_union_agg — and that the
    exact counts are internally consistent."""
    from praw_etl_student_dropout_spark.sources.readers import load_tables
    from pyspark.sql import functions as F

    df = entry_mod.queries()["a11b_hll_sketch_union"](spark, "/root/testdata/sf0.01")
    rows = {r.event_type: r for r in df.collect()}
    assert all(r.within_bound for r in rows.values()), rows
    ev = load_tables(spark, "/root/testdata/sf0.01", ["events"])["events"]
    exact_all = ev.select("user_id").distinct().count()
    assert rows["ALL"].exact_users == exact_all
    # union row covers at least the largest group
    assert rows["ALL"].exact_users >= max(
        r.exact_users for k, r in rows.items() if k != "ALL"
    )


def test_approx_percentile_within_bounds(spark):
    """Sketch accuracy contract (round-7 form): the entry now grades the
    invariant itself — approx_ok must hold in every group (approx median
    between the exact 0.499/0.501 percentiles, 10x the GK eps bound),
    alongside the bit-stable exact median the oracle also computes."""
    df = entry_mod.queries()["a12_approx_percentiles"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.approx_ok, r
        assert r.exact_median is not None and r.cnt > 0, r


def test_graded_prefix_pins_first_50_oracle_backed():
    """The driver grades the first 50 queries() slots. GRADED_PREFIX must
    (a) hold exactly 50 names, (b) every name resolvable in the registry
    (a renamed/removed query would silently slide a rows-only entry into
    the graded window), (c) every one oracle-backed, and (d) actually BE
    the catalog's first 50 in iteration order."""
    from praw_etl_student_dropout_spark.plans import GRADED_PREFIX, catalog_all

    cat = catalog_all()
    assert len(GRADED_PREFIX) == 50
    missing = [n for n in GRADED_PREFIX if n not in cat]
    assert not missing, f"GRADED_PREFIX names not in registry: {missing}"
    rows_only = [n for n in GRADED_PREFIX if cat[n].oracle is None]
    assert not rows_only, f"rows-only queries in the graded window: {rows_only}"
    assert list(cat)[:50] == GRADED_PREFIX
    # the LLM-pipeline mandate stays visible to the hard signal
    llm = {n for n in GRADED_PREFIX if n.startswith(("llm_", "d3_", "u6_", "u7_", "u8_", "u10_", "multimodal"))}
    assert len(llm) >= 10, f"only {len(llm)} LLM-pipeline queries graded"
