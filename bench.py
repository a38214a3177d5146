"""Benchmark harness — headline queries at sf0.1 vs BASELINE.md.

Prints ONE JSON line:
  {"metric": "suite_wall_sec", "value": N, "unit": "sec",
   "queries": {...per-query warm sec...}, "sf": 0.1}

Method (BASELINE.md "Targets"): one long-lived warm SparkSession for the
whole suite; per query, one warm-up run then best-of-2 timed runs
(steady-state — Spark local-mode job-scheduling overhead is the floor on
the smallest queries, SURVEY §6 risk flag). Results are materialized with
collect() to match how the DuckDB baseline was measured (fetchall).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cuny_courses_spark.registry import queries  # noqa: E402
from cuny_courses_spark.session import get_session  # noqa: E402

# The six BASELINE.md headline queries (SURVEY §6).
HEADLINE = [
    "q_agg_groupby",
    "q_limit_topk",
    "q_join_star_multiway",
    "q_win_latest_per_key",
    "q_stream_tumbling",
    "q_sim_pairs_threshold",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = queries()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).collect()  # warm-up: plan + code-gen + page cache
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
            del rows
        per_query[name] = round(best, 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
