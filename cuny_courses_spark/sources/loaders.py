"""Typed table loaders over the driver-generated parquet testdata.

The reference ingests untyped CUNYfirst CSV exports and typecasts per row in
Python (SURVEY §1.1); here every table is a parquet scan with a declared
schema contract (FIXTURES.md), verified by tests — never ``inferSchema`` in a
production path. Column pruning and predicate pushdown then come free from
the vectorized parquet reader (SURVEY §4).

Scale note (100 TB): these are plain ``spark.read.parquet`` scans, so they
inherit partition discovery, row-group pruning and `maxPartitionBytes`
splitting; on a cluster the same loaders work unchanged against an object
store — no collect, no driver-side I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Expected Spark schemas (FIXTURES.md "Schemas") — the §5 input contract.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),  # parquet ns → µs truncation
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),  # JSON string '{"k": <int>}'
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def path(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Parquet scan of one testdata table (schema carried by the files).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` (set in session.RUNTIME_CONFS)
    it arrives as int64 nanos and is converted here to µs TimestampType via
    integer division (``div`` — no double round-trip, which would lose
    precision above 2^53 ns).

    The analyzed DataFrame is memoized on the session object: re-listing
    files + reading parquet footers costs 100s of driver-side ms per call,
    while the DataFrame itself is an immutable plan, safe to share. The
    memo dies with the session (it lives on the session object).
    """
    if table not in TABLES:
        raise KeyError(f"unknown table {table!r}; expected one of {TABLES}")
    cache: dict[tuple[str, str], DataFrame] | None = getattr(
        spark, "_ccs_df_cache", None
    )
    if cache is None:
        cache = {}
        spark._ccs_df_cache = cache
    df = cache.get((sf_dir, table))
    if df is None:
        df = spark.read.parquet(path(sf_dir, table))
        if table == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        cache[(sf_dir, table)] = df
    return df


def validate_schema(spark: SparkSession, sf_dir: str, table: str) -> None:
    """Assert the on-disk schema matches the FIXTURES.md contract."""
    got = load(spark, sf_dir, table).schema
    want = SCHEMAS[table]
    got_simple = [(f.name, f.dataType.simpleString()) for f in got.fields]
    want_simple = [(f.name, f.dataType.simpleString()) for f in want.fields]
    if got_simple != want_simple:
        raise AssertionError(
            f"{table}: schema drift\n  on disk: {got_simple}\n  contract: {want_simple}"
        )
