"""Prepared-plan cache — reuse plan construction + analysis across calls.

Building a registered query repeats identically on every invocation:
~tens of py4j round trips to construct the logical plan, then eager
Catalyst analysis. This module memoizes the ANALYZED Dataset per

    (SparkSession, query name, sf_dir, content signature of sf_dir)

and returns a fresh ``select("*")`` wrapper over it on every call.

Why the wrapper matters: re-collecting the *same* Dataset object would
reuse its registered shuffle map outputs (Spark skips whole map stages
whose ShuffleDependency is already materialized), silently turning
re-execution into partial result reuse — wrong thing to measure in a
bench, and it pins shuffle files for the session lifetime. The
``select("*")`` wrapper shares the cached analysis but builds a fresh
physical plan with fresh RDDs, so optimization, codegen lookup, scans,
shuffles — ALL data work — re-run on every call. Only driver-side plan
construction + analysis are saved (prepared-statement semantics; DuckDB's
~ms re-plan never paid this cost).

A regenerated dataset at the same path, a different scale factor, or a
fresh session each rebuild from scratch (the content signature walks the
directory recursively, covering directory-shaped tables).

Kill switch: set ``SPARK_GRAFT_NO_PLAN_CACHE=1`` to force rebuild-per-call
(used when testing conf changes between two builds of the same query).
"""

from __future__ import annotations

import os
import weakref
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import cuny_courses_spark.session as _session
from cuny_courses_spark.session import _dir_signature

# WeakKeyDictionary on the SparkSession: entries die with the session, so a
# restarted session (new JVM Datasets) can never serve stale plan handles.
_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()

# Analyzed plans are small (no executed state), but bound the per-session
# entry count anyway; FIFO eviction (dict preserves insertion order).
_MAX_ENTRIES = 256


def enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_NO_PLAN_CACHE", "") != "1"


def get_or_build(
    name: str,
    fn: Callable[[SparkSession, str], DataFrame],
    spark: SparkSession,
    sf_dir: str,
) -> DataFrame:
    """Return a fresh re-execution wrapper over the cached analyzed Dataset
    for (spark, name, sf_dir, content-sig), building via ``fn`` on miss.

    Build errors propagate unchanged (``fn`` is called at most once per
    miss); only cache bookkeeping failures fall back to an uncached build.
    """
    if not enabled():
        return fn(spark, sf_dir)
    try:
        per_session = _CACHE.setdefault(spark, {})
        # The scale profile picks ALGORITHMS (session.is_small_input), so a
        # plan built under one profile must never serve the other.
        key = (
            name,
            sf_dir,
            _dir_signature(sf_dir),
            _session.is_small_input(sf_dir),
        )
        df = per_session.get(key)
    except Exception:
        return fn(spark, sf_dir)
    if df is None:
        df = fn(spark, sf_dir)  # errors propagate; never re-invoked here
        try:
            # Drop stale entries for this (name, sf_dir): the signature
            # changed, and the dict must not grow per regeneration.
            for k in [k for k in per_session if k[:2] == (name, sf_dir)]:
                del per_session[k]
            while len(per_session) >= _MAX_ENTRIES:
                per_session.pop(next(iter(per_session)))
            per_session[key] = df
        except Exception:
            return df
    try:
        return df.select("*")
    except Exception:
        return fn(spark, sf_dir)
