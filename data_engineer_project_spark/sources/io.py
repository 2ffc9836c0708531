"""Typed file I/O (SURVEY §2.1): CSV/JSON readers and the partitioned
parquet sink.

The reference declares every schema with DDL and never infers
(`Members&EligibilitySource.sql:14-115`); these readers keep that
contract — an explicit ``StructType`` is REQUIRED, so a malformed file
surfaces as nulls/errors deterministically instead of silently changing
inferred types between runs.

Scale notes: facts are written parquet partitioned by a date-derived
column (the engine's replacement for the reference's indexes, SURVEY
§4): partition pruning turns date-range predicates into directory
pruning, and dynamic partition overwrite makes per-period re-loads
idempotent without touching other periods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """CSV with a declared schema (no inference pass — one scan only)."""
    return spark.read.csv(path, schema=schema, header=header, mode="PERMISSIVE")


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines with a declared schema (no inference pass)."""
    return spark.read.json(path, schema=schema)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Fact-table sink: parquet partitioned by the given columns.

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` an
    overwrite only replaces the partitions present in ``df`` — the
    idempotent-reload semantics the reference gets from NOT EXISTS
    guards (`StarSchemaForHealthcare.sql:177-180`).
    """
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset; filters on partition columns prune
    directories before any file is opened (verify via PartitionFilters
    in the physical plan)."""
    return spark.read.parquet(path)
