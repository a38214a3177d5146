"""Degenerate-input robustness: every operator family must handle a
0-row-but-valid-schema dataset without raising.

At 100 TB this is not a corner case — a freshly created partition, a
filter that matches nothing, or a backfill window before data exists all
present empty inputs to the same plans. A query may legitimately return 0
rows or a single all-null/zero aggregate row; it may NOT throw (a driver
job that dies at 3 a.m. on an empty landing dir is an operational bug,
not a data bug)."""

from __future__ import annotations

import pytest

from cuny_courses_spark.registry import queries
from tests.conftest import SF_DIR

_QS = queries()

# One representative per plan family (scan, filter, equi/outer/asof join,
# agg, rollup, window, streak, set op, topk, dedup inverted index,
# similarity block scan, text, sampling, sessionize/gapfill/interpolate,
# streaming twins, graph, ETL audit, SQL composite, mode/histogram).
REPRESENTATIVES = [
    "q_scan_parquet",
    "q_filter_compound",
    "q_join_inner_equi",
    "q_join_full",
    "q_join_asof_nearest",
    "q_join_band_lookup",
    "q_agg_groupby",
    "q_agg_rollup",
    "q_agg_mode",
    "q_agg_histogram",
    "q_win_latest_per_key",
    "q_win_streak",
    "q_win_median_sliding",
    "q_set_except",
    "q_limit_topk",
    "q_dedup_near_jaccard",
    "q_dedup_containment",
    "q_sim_pairs_threshold",
    "q_text_wordcount",
    "q_sample_reservoir_group",
    "q_ts_sessionize",
    "q_ts_interpolate_linear",
    "q_ts_ewma",
    "q_stream_tumbling",
    "q_stream_topk_windowed",
    "q_graph_common_neighbors",
    "q_etl_fk_orphans",
    "q_etl_table_stats",
    "q_sql_q6_forecast_filter",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    # 0-row copies of every table, schemas intact (limit(0) preserves the
    # exact parquet logical types, including events' ns timestamp column).
    import glob
    import os

    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("sf_empty")
    for f in sorted(glob.glob(f"{SF_DIR}/*.parquet")):
        t = pq.read_table(f)
        pq.write_table(t.slice(0, 0), out / os.path.basename(f))
    return str(out)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_runs_on_empty_input(spark, empty_sf_dir, name):
    rows = _QS[name](spark, empty_sf_dir).collect()
    # Global aggregates may emit one all-null/zero row, fixed-shape audits
    # (fk_orphans: one row per declared FK edge) their constant row set;
    # everything keyed must be empty. Either way: no exception, stable
    # schema, and never data-derived rows.
    assert len(rows) <= 9, f"{name} emitted {len(rows)} rows on empty input"
