"""Regenerate PLANS.md — the executed physical plans of the headline and
heavy-pipeline queries, with the scale-relevant lines called out.

Usage: python tools/plans_dump.py [--sf /root/testdata/sf0.01]
The file is evidence, not configuration: it shows (not claims) that
filters/projections reach the parquet scan, dims broadcast, top-k avoids
global sorts, and the pair ops are equi-joins — the properties the plan
tests assert one by one."""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuny_courses_spark.registry import queries  # noqa: E402
from cuny_courses_spark.session import get_session  # noqa: E402

SHOW = [
    ("q_agg_groupby", "flagship Q1 shape: pushed filter + pruned scan + 2-phase hash agg"),
    ("q_limit_topk", "Q3 shape: broadcast dim + shuffle-hash fact join + TakeOrderedAndProject"),
    ("q_join_star_multiway", "Q5 shape: constant dims folded to pushed In() + literal map; 4 scans, ≤3 broadcasts"),
    ("q_win_latest_per_key", "window dedup: one exchange + per-partition sort"),
    ("q_stream_tumbling",
     "tumbling twin: arithmetic µs hour key, partial+final agg"),
    ("q_join_asof_nearest", "union-sweep as-of: ONE exchange, two frames, no join"),
    ("q_dedup_near_jaccard", "inverted shingle index: shuffle-hash equi-join, no nested loop"),
    ("q_graph_common_neighbors", "wedge equi-join + anti join; hub cap at scale"),
    ("q_etl_table_stats",
     "r16 per-column union profile: six single-distinct aggregates, "
     "no Expand row amplification"),
    ("q_ts_ewma", "exact-int64 EWMA: JVM higher-order fold, no Python stage"),
    ("q_sql_q16_supplier_cnt",
     "r8 dedup-first Q16: int-key pair dedup before string label joins"),
    ("q_sql_q8_mkt_share",
     "r15 count-gated Q8: runtime-small sides checkpointed+counted, "
     "broadcast under the star gate — zero fact exchanges"),
    ("q_sql_q7_nation_volume",
     "r8 zero-exchange Q7: all builds broadcast; one agg exchange total"),
    ("q_sql_q5_local_volume",
     "r8 zero-exchange Q5: bounded oc broadcast; one agg exchange total"),
    ("q_text_idf_top_terms",
     "r14 Arrow-local preagg: tokenize+posting reduce inside one "
     "mapInArrow stage; the single exchange is vocabulary-sized"),
    ("q_pipeline_multimodal_ingest",
     "r14 binaryFile ingest: content bytes stay in the scan stage; "
     "only (hash, length) partials cross the exchanges"),
]

KEY_LINES = re.compile(
    r"PushedFilters|ReadSchema|BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin"
    r"|TakeOrderedAndProject|Exchange|HashAggregate|Window |Expand"
    r"|BroadcastNestedLoopJoin|CartesianProduct|ArrowEvalPython|FlatMapGroupsInPandas"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = get_session("plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    out = [
        "# PLANS — executed physical plans (generated; do not edit)",
        "",
        f"Regenerate: `python tools/plans_dump.py --sf {args.sf}`.",
        "Full plans below; `>>` marks the scale-relevant operators the",
        "plan tests (tests/test_plans.py) assert individually.",
        "",
    ]
    for name, note in SHOW:
        df = qs[name](spark, args.sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {name}")
        out.append(f"_{note}_")
        out.append("")
        out.append("```")
        for line in plan.splitlines():
            if len(line) > 200:
                line = line[:197] + "..."
            mark = ">>" if KEY_LINES.search(line) else "  "
            out.append(f"{mark}{line}")
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(SHOW)} queries)")


if __name__ == "__main__":
    main()
