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


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Pure declarative scan — filters/projections
    applied by callers push down into the parquet reader.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects; the session contract (``normalize_session``) reads
    it as raw nanos (legacy nanosAsLong) and we floor-divide to
    microseconds — the same truncation DuckDB applies, so oracle
    comparisons agree. ``div`` (integer division) is deliberate:
    ns-since-epoch exceeds double's 53-bit mantissa.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from data_engineer_project_spark.session import normalize_session

        normalize_session(spark)
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
