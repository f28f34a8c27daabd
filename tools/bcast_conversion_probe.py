"""One-off probe (round-14, VERDICT r13 #1 done-criteria): after the
broadcast_if_dim conversion removed forced F.broadcast() hints from
SF-scaling build sides, does AQE's runtime size check re-derive the
SAME BroadcastHashJoin at fixture scale?

For every converted entry, executes the plan at $SPARK_GRAFT_SF_DIR
(default sf0.1) and prints the FINAL adaptive plan's join-node census
(BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin / BroadcastNestedLoop).
The claim shipped in SCALE_r14: every formerly-hinted join still executes
as a broadcast at fixture SF — the conversion changed the 100 TB failure
mode (hint-forced OOM → AQE demotion to shuffle), not the local plan.

Usage: python tools/bcast_conversion_probe.py [entry ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Every catalog entry whose build sides lost a forced hint in the r14
# conversion (call sites grep: bounded=False).
CONVERTED = [
    "q5_region_volume",
    "q7_nation_volume",
    "q14_promo_share",
    "q19_disjunctive_filter",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q16_supplier_count",
    "q21_waiting_supplier",
    "q2_min_cost_supplier",
    "q20_part_promotion",
    "a22_listagg",
    "a31_contribution_shares",
    "a45_hhi_concentration",
    "q21_preagg_colocation",
    "q21_preagg_refresh",
    # graph family rides the shared (now materialized) derivation
    "u9_triangle_count",
    "u9_clustering_coeff",
]

JOIN_NODES = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def main() -> None:
    from praw_etl_student_dropout_spark.plans import catalog_all
    from praw_etl_student_dropout_spark.session import get_spark

    names = sys.argv[1:] or CONVERTED
    spark = get_spark(app_name="bcast_conversion_probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = catalog_all()
    out = {}
    for name in names:
        df = registry[name].builder(spark, SF_DIR)
        df.count()  # materialize so AQE finalizes the adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        census = {n: len(re.findall(rf"\b{n}\b", plan)) for n in JOIN_NODES}
        census = {k: v for k, v in census.items() if v}
        out[name] = census
        print(f"# {name}: {census}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
