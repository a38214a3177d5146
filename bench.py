"""Benchmark harness — headline queries at sf0.1 vs BASELINE.md.

Prints ONE JSON line:
  {"metric": "suite_wall_sec", "value": N, "unit": "sec",
   "queries": {...per-query warm sec...}, "sf": 0.1}

Method (BASELINE.md "Targets"): one long-lived warm SparkSession for the
whole suite; a full warm-up lap over every headline query first (JIT/C2
compilation, codegen cache, page cache — the DuckDB baseline was measured
warm too), then per query best-of-5 timed runs (steady-state — Spark
local-mode job-scheduling overhead is the floor on the smallest queries,
SURVEY §6 risk flag). Results are materialized with collect() to match how
the DuckDB baseline was measured (fetchall).

Warm runs go through the engine's prepared-plan cache
(cuny_courses_spark/plans/plan_cache.py): driver-side plan construction +
Catalyst ANALYSIS are reused across laps (prepared-statement semantics;
DuckDB's ~ms re-plan never paid that cost), but each lap gets a fresh
``select("*")`` wrapper — fresh physical plan, fresh RDDs — so
optimization, scans, shuffles and aggregation ALL re-execute per lap.
(Re-collecting the same Dataset object would silently reuse its shuffle
map outputs and skip whole stages — explicitly NOT what's measured here.)
The JSON reports plan_cache for transparency.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cuny_courses_spark.plans.plan_cache import enabled as plan_cache_enabled  # noqa: E402
from cuny_courses_spark.registry import oracles, queries  # noqa: E402
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

# Heavy data-pipeline operators, reported Spark-only ("extended" in the
# JSON): their DuckDB oracles are deliberately quadratic (all-pairs
# list_intersect, etc. — BASELINE.md "scale divergence") and take minutes
# at sf0.1, so the per-round bench records only the engine side; the
# oracle correctness runs at sf0.01 in the driver's own gate.
EXTENDED = [
    "q_dedup_near_jaccard",
    "q_dedup_minhash_lsh",
    "q_sim_neardup_cosine",
    "q_text_repetition",
]

N_ROW_GROUPS = 32


def prepare_layout(sf_dir: str) -> str:
    """Ingest step: re-chunk each single-row-group testdata file into
    N_ROW_GROUPS row groups so scans parallelize across cores.

    A parquet row group is Spark's minimum split unit; the driver-generated
    files carry ONE row group each, which serializes every scan onto one
    task no matter the cluster size. Controlling file/row-group layout is
    exactly what the engine would do at ingest on a real cluster (SURVEY
    §7: size partitions to maxPartitionBytes) — values are bit-identical,
    only the layout changes, and the JSON reports it. Idempotent per
    sf_dir; falls back to the original dir on any mismatch.
    """
    import pyarrow.parquet as pq

    # Cache key covers content identity (name/size/mtime per file), not just
    # the path — a regenerated sf_dir must never serve a stale layout.
    sig = hashlib.md5(sf_dir.encode())
    for f in sorted(Path(sf_dir).glob("*.parquet")):
        st = f.stat()
        sig.update(f"{f.name}:{st.st_size}:{st.st_mtime_ns}".encode())
    out = Path("/tmp") / "ccs_bench_layout" / sig.hexdigest()[:12]
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    try:
        for f in sorted(Path(sf_dir).glob("*.parquet")):
            t = pq.read_table(f)
            rg = max(1, (t.num_rows + N_ROW_GROUPS - 1) // N_ROW_GROUPS)
            pq.write_table(t, out / f.name, row_group_size=rg)
            if pq.read_table(out / f.name).schema != t.schema:
                raise RuntimeError(f"schema drift re-chunking {f.name}")
        done.touch()
        return str(out)
    except Exception:
        return sf_dir


def main() -> None:
    orig_sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", orig_sf_dir)
    sf = float(m.group(1)) if m else -1.0
    sf_dir = prepare_layout(orig_sf_dir)
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = queries()
    for _ in range(2):  # warm-up laps: plan + code-gen + JIT + page cache
        for name in HEADLINE:
            qs[name](spark, sf_dir).collect()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
            del rows
        per_query[name] = round(best, 4)

    total = round(sum(per_query.values()), 4)

    extended: dict[str, float] = {}
    for name in EXTENDED:
        try:
            fn = qs[name]
            fn(spark, sf_dir).collect()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            extended[name] = round(best, 4)
        except Exception:
            continue  # headline metric must survive an extended-op failure

    # Same-conditions baseline: run each headline query's DuckDB oracle
    # back-to-back in this process, same files, same machine load, same
    # warm-up + best-of-5 method. Absolute seconds fluctuate ±30-50 % with
    # background load on this host (BASELINE.md), inflating BOTH engines
    # alike — the per-round ratio below is the load-fair signal the
    # idle-machine BASELINE.md table can't give a loaded run.
    duck_query: dict[str, float] = {}
    try:
        from cuny_courses_spark.oracle import duck_con

        con = duck_con(sf_dir)
        os_ = oracles()
        for _ in range(2):  # warm-up laps (page cache, plan cache)
            for name in HEADLINE:
                con.execute(os_[name]).fetchall()
        for name in HEADLINE:
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                con.execute(os_[name]).fetchall()
                best = min(best, time.perf_counter() - t0)
            duck_query[name] = round(best, 4)
    except Exception:
        duck_query = {}  # Spark side still reports; ratio just absent
    duck_total = round(sum(duck_query.values()), 4) if duck_query else None

    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "layout": (
                    f"rechunked_{N_ROW_GROUPS}_row_groups"
                    if sf_dir != orig_sf_dir
                    else "original"
                ),
                "plan_cache": plan_cache_enabled(),
                "extended": extended,
                "duckdb_queries": duck_query,
                "duckdb_suite_sec": duck_total,
                "ratio_vs_duckdb": (
                    round(total / duck_total, 3) if duck_total else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
