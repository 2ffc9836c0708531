"""Testdata source registry: parquet readers for the driver tables.

The driver generates a TPC-H-ish star schema plus events/documents/
embeddings at /root/testdata/sf{0.001,0.01,0.1} (see TESTDATA.md).
Readers are plain ``spark.read.parquet`` so Catalyst gets vectorized
scans with predicate pushdown + column pruning for free; at 100 TB these
would be the same calls pointed at partitioned cloud storage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
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
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Bring ``events.ts`` to session-timezone TIMESTAMP whatever the
    on-disk physical type is.

    Driver testdata has shipped two layouts across rounds:
    TIMESTAMP(NANOS) (read as raw int64 nanos under the session's
    ``nanosAsLong`` contract — the vectorized reader rejects NANOS
    otherwise) and plain ``timestamp[us]`` (read as TIMESTAMP_NTZ under
    Spark 4's NTZ inference). Branch on the observed dtype instead of
    assuming either, so the engine survives a testdata regeneration.
    ``div`` (integer division) for the nanos path is deliberate:
    ns-since-epoch exceeds double's 53-bit mantissa; truncation to
    micros matches DuckDB.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    t = df.schema["ts"].dataType
    if isinstance(t, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(t, TimestampNTZType):
        # session tz is pinned UTC, so NTZ wall-clock == the instant
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Pure declarative scan — filters/projections
    applied by callers push down into the parquet reader.

    ``events.ts`` goes through ``normalize_event_ts`` (physical-type
    drift across driver rounds: nanos vs micros).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from data_engineer_project_spark.session import normalize_session

        normalize_session(spark)
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


class Tables:
    """Lazy dict-like access: ``t.lineitem`` / ``t['orders']``.

    Memoized per name so repeated access returns the SAME DataFrame
    instance — column references like ``t.customer.c_custkey`` then
    resolve against the exact plan being joined (fresh reads would be
    distinct plan subtrees and fail attribute resolution).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return self[name]

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = read_table(self._spark, self._sf_dir, name)
        return self._cache[name]


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> Tables:
    return Tables(spark, sf_dir or DEFAULT_SF_DIR)


def register_views(spark: SparkSession, sf_dir: str | None = None, prefix: str = "") -> None:
    """Register every driver table as a temp view (SQL surface, EP3)."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    for name in TABLE_NAMES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
