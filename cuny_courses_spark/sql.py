"""SQL entry surface — plain-SQL access to every engine table.

The reference's downstream consumers are SQL scripts over its Postgres
schema (SURVEY §3.3); this module is the parity surface: register all ten
tables as temp views over one sf_dir and run arbitrary Spark SQL against
them. Views are session-scoped plans over the typed loaders (events'
ns→µs conversion included), so SQL users get identical semantics to the
DataFrame registry — the two surfaces share one set of scans and one
Catalyst pipeline.

``run_sql`` is the one-call form used by the `q_subquery_*` registry
entries; user code can call ``register_views`` once and ``spark.sql``
freely afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cuny_courses_spark.sources.loaders import TABLES, load


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create/replace a temp view per table over ``sf_dir``.

    The engine OWNS the ten contract view names (``region`` … ``embeddings``)
    in any session it touches — callers must not bind those names to other
    datasets, since every SQL-surface query (re)points them at its own
    ``sf_dir``. Re-registering is cheap (plan replacement, no I/O).
    """
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    spark._ccs_views_sf_dir = sf_dir


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Evaluate ``sql`` against the table views over ``sf_dir``.

    Views are (re)registered only when this session's current view binding
    differs — repeated same-dir calls skip the ten createOrReplace round
    trips and, more importantly, don't churn bindings under a caller
    already working against the same directory."""
    if getattr(spark, "_ccs_views_sf_dir", None) != sf_dir:
        register_views(spark, sf_dir)
    return spark.sql(sql)
