"""Round-14 maintenance-rung decompositions (VERDICT r13 #4/#6 done-
criteria), run against a replica dir (default the 32x key-shifted set):

- snapshot rung: cost of ADVANCING the persisted T0 snapshot to T1 by
  folding only the (T0, T1] delta (etl_snapshot_refresh, warm layout)
  vs REBUILDING state at T1 from the full changelog (snapshot_asof over
  every row <= T1) — plus the row counts that make "cost ∝ delta" a
  measured claim, not a slogan.
- IVF rung: cold index build (centroids + bucketed assignments) vs the
  warm-layout query (u7_ivf_persisted), plus routing cost on the delta
  tenth vs the base nine-tenths (append cost ∝ delta, never corpus).

Prints one JSON line. Timings are min-of-2 on the query legs, single
shot on the build legs (a build is a one-off by definition).

Usage: python tools/r14_rung_probe.py [replica_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_32x"


def t(fn, runs=1):
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return round(min(out), 3)


def main() -> None:
    from praw_etl_student_dropout_spark.operators.bucketing import (
        EVENTS_SNAPSHOT_T0,
        IVF_DELTA_MOD,
        ensure_events_snapshot,
        ensure_ivf_index,
        events_cdc_log,
        _IVF_TAG,
        _SNAP_T0_TAG,
    )
    from praw_etl_student_dropout_spark.operators.etl import snapshot_asof
    from praw_etl_student_dropout_spark.operators.similarity import (
        assign_centroids,
    )
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.session import get_spark
    from praw_etl_student_dropout_spark.sources.partitioned import _scratch_root
    from praw_etl_student_dropout_spark.sources.readers import load_tables
    from pathlib import Path

    spark = get_spark(app_name="r14_rung_probe")
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog_all()
    out = {"dir": DIR}
    fixture = Path(DIR).name

    # ---- snapshot rung ------------------------------------------------
    ev = load_tables(spark, DIR, ["events"])["events"]
    t1 = "2024-01-25 00:00:00"
    log_t1 = events_cdc_log(ev).filter(F.col("ts") <= F.lit(t1).cast("timestamp"))
    delta = events_cdc_log(ev).filter(
        (F.col("ts") > F.lit(EVENTS_SNAPSHOT_T0).cast("timestamp"))
        & (F.col("ts") <= F.lit(t1).cast("timestamp"))
    )
    # cold snapshot build (the T0 materialization, one-off maintenance)
    snap_tbl = f"bkt_events_snap_{_SNAP_T0_TAG}_{fixture}_b8".replace(".", "_").replace("-", "_")
    spark.sql(f"DROP TABLE IF EXISTS {snap_tbl}")
    shutil.rmtree(
        _scratch_root() / "bucketed" / f"{fixture}_b8" / f"events_snap_{_SNAP_T0_TAG}",
        ignore_errors=True,
    )
    out["snapshot"] = {
        "rows_log_le_t1": log_t1.count(),
        "rows_delta": delta.count(),
        "t_build_t0_layout_s": t(lambda: ensure_events_snapshot(spark, DIR)),
        "t_rebuild_at_t1_s": t(
            lambda: snapshot_asof(log_t1, "user_id", ["ts", "event_id"]).count(),
            runs=2,
        ),
        "t_refresh_s": t(
            lambda: reg["etl_snapshot_refresh"].builder(spark, DIR).count(), runs=2
        ),
    }
    s = out["snapshot"]
    s["delta_fraction"] = round(s["rows_delta"] / s["rows_log_le_t1"], 4)
    s["refresh_vs_rebuild"] = round(s["t_refresh_s"] / s["t_rebuild_at_t1_s"], 3)
    print(f"# snapshot: {s}", file=sys.stderr)

    # ---- IVF rung ------------------------------------------------------
    emb = load_tables(spark, DIR, ["embeddings"])["embeddings"]
    base = emb.filter(F.col("vec_id") % IVF_DELTA_MOD != 0)
    dlt = emb.filter(F.col("vec_id") % IVF_DELTA_MOD == 0)
    tag = f"{fixture}_b8".replace(".", "_").replace("-", "_")
    for tbl in (f"ivf_centroids_{_IVF_TAG}_{tag}", f"bkt_ivf_assign_{_IVF_TAG}_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(_scratch_root() / "part" / fixture / f"ivf_centroids_{_IVF_TAG}", ignore_errors=True)
    shutil.rmtree(_scratch_root() / "bucketed" / f"{fixture}_b8" / f"ivf_assign_{_IVF_TAG}", ignore_errors=True)
    t_build = t(lambda: ensure_ivf_index(spark, DIR))
    cent = spark.table(ensure_ivf_index(spark, DIR)[0])
    out["ivf"] = {
        "rows_base": base.count(),
        "rows_delta": dlt.count(),
        "t_build_cold_s": t_build,
        "t_query_warm_s": t(
            lambda: reg["u7_ivf_persisted"].builder(spark, DIR).count(), runs=2
        ),
        "t_route_delta_s": t(lambda: assign_centroids(dlt, cent).count(), runs=2),
        "t_route_base_s": t(lambda: assign_centroids(base, cent).count(), runs=2),
    }
    v = out["ivf"]
    v["route_ratio"] = round(v["t_route_delta_s"] / v["t_route_base_s"], 3)
    v["rows_ratio"] = round(v["rows_delta"] / v["rows_base"], 3)
    print(f"# ivf: {v}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
