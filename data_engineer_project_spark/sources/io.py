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

import os

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


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC reader (columnar, predicate-pushdown-capable like parquet).
    Schema optional — ORC footers carry types; declare one to pin the
    contract when files come from a foreign writer."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — interop surface for Hive-era consumers; same
    dynamic-overwrite and partitioning semantics as parquet apply via
    the generic writer options if needed."""
    df.write.mode(mode).orc(path)


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


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-aware fact sink: range-partition by ``sort_cols`` across
    files, sort within each file, write parquet.

    Why this matters at 100 TB: parquet stores per-row-group min/max
    statistics, and both Spark's reader and external engines skip row
    groups whose stat range can't match a pushed predicate. That
    skipping is only effective when values are CLUSTERED — a random
    layout makes every row group's [min,max] span the whole domain and
    nothing prunes. ``repartitionByRange`` + ``sortWithinPartitions``
    gives globally disjoint, internally sorted files, so a selective
    filter on the sort key touches O(matching) row groups instead of
    all of them. The cheap stand-in for a table format's Z-ORDER /
    OPTIMIZE clustering, expressed with two built-in operators.
    """
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in sort_cols]
    out = df.repartitionByRange(*cols) if n_files is None else df.repartitionByRange(
        n_files, *cols
    )
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def _orderable_as_double(df: DataFrame, c: str):
    """Map any orderable column to a double that preserves its order
    (dates → epoch days, timestamps → epoch seconds, numerics → cast).
    Strings get ``xxhash64`` — equal values still co-cluster, but range
    locality is lost, same trade a hash-partitioned layout makes."""
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get(c, "")
    col = F.col(c)
    if dt == "date":
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if dt.startswith("timestamp"):
        return col.cast("double")
    if dt == "string":
        return F.xxhash64(col).cast("double")
    if dt == "boolean":
        return col.cast("int").cast("double")
    return col.cast("double")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order (Morton) interleave key over 2+ columns.

    Each column is rank-normalized to ``2^bits`` levels, then the bit
    planes are interleaved into one long. Sorting/range-partitioning by
    this key clusters EVERY participating column simultaneously, so
    row-group min/max stats stay selective for predicates on any of
    them — the multi-column data-skipping layout single-column sorting
    can't give.

    Scale design: rank-normalization is distributed, never a global
    sort. One aggregate pass computes per-column ``approx_percentile``
    cutoffs (a mergeable sketch — map-side partials, one small final
    merge), the ≤4095-cutoff arrays ship to every task as Arrow-batch
    closure state, and level assignment is a vectorized
    ``np.searchsorted`` scalar pandas UDF (O(log levels) per row, no
    shuffle, no window). Quantile cutoffs, not (max-min)/n buckets, so
    skew can't collapse the curve — same property the previous
    ``ntile`` form had, without its single-partition sort. Cutoff
    resolution caps at 2^12 (finer planes zero-fill): row-group
    clustering needs file-count granularity, not 65536 distinct ranks.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 columns; use a plain sort for 1")
    if bits * n > 62:
        raise ValueError(f"bits={bits} too large for {n} columns (max {62 // n})")

    q_bits = min(bits, 12)
    shift = bits - q_bits
    levels = 1 << q_bits
    probs = [i / levels for i in range(1, levels)]
    numeric = [_orderable_as_double(df, c) for c in cols]
    accuracy = max(10_000, levels * 8)
    cut_row = df.agg(
        *[
            F.percentile_approx(num, probs, accuracy).alias(f"__q_{i}")
            for i, num in enumerate(numeric)
        ]
    ).first()

    def make_level(cuts_list):
        cuts = np.asarray(cuts_list or [], dtype=np.float64)

        def level(v):
            x = v.to_numpy(dtype=np.float64, na_value=np.nan)
            idx = np.searchsorted(cuts, x, side="right").astype(np.int64)
            np.minimum(idx, levels - 1, out=idx)
            idx[np.isnan(x)] = 0  # nulls-first, matching ntile's ordering
            return pd.Series(idx << shift)

        # Real (non-string) annotations: the module's `from __future__
        # import annotations` would otherwise stringify them where the
        # locally-imported `pd` can't be resolved by the UDF inspector.
        level.__annotations__ = {"v": pd.Series, "return": pd.Series}
        return F.pandas_udf(level, "long")

    out = df.select(
        "*",
        *[
            make_level(cut_row[f"__q_{i}"])(num).alias(f"__r_{i}")
            for i, num in enumerate(numeric)
        ],
    )
    key = F.lit(0).cast("long")
    for plane in range(bits - 1, -1, -1):
        for i in range(n):
            bit = F.shiftright(F.col(f"__r_{i}").cast("long"), plane).bitwiseAND(
                F.lit(1).cast("long")
            )
            key = F.shiftleft(key, 1).bitwiseOR(bit)
    return out.withColumn("__zkey", key).drop(*[f"__r_{i}" for i in range(n)])


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int | None = None,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Multi-column clustered sink: range-partition + sort by the
    Morton key, drop it, write parquet. See ``zorder_key`` for why.

    Fully distributed end-to-end: cutoff sketch aggregate → vectorized
    rank lookup → range partition → within-partition sort. No stage
    funnels the table through one task, so the write scales with the
    cluster like OPTIMIZE ZORDER does."""
    from pyspark.sql import functions as F

    keyed = zorder_key(df, cols, bits)
    out = (
        keyed.repartitionByRange(F.col("__zkey"))
        if n_files is None
        else keyed.repartitionByRange(n_files, F.col("__zkey"))
    )
    out.sortWithinPartitions("__zkey").drop("__zkey").write.mode(mode).parquet(path)


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset; filters on partition columns prune
    directories before any file is opened (verify via PartitionFilters
    in the physical plan)."""
    return spark.read.parquet(path)


def compact_parquet(
    spark: SparkSession, path: str, target_mb: int = 128
) -> int:
    """Compact a parquet dataset's small files into ~``target_mb`` files.

    Streaming sinks and incremental loads leave file sprawl that
    degrades scan parallelism (one task per tiny file) and NameNode/
    listing pressure at scale. This rewrites the dataset with a file
    count derived from its on-disk size — a coalesce-style maintenance
    pass, the engine's stand-in for OPTIMIZE/auto-compaction in table
    formats. Returns the new file count.

    Rewrite goes through a temp sibling directory then an atomic-ish
    swap, so a reader never sees a half-written dataset; at production
    scale you would do this per partition (date) under a table format's
    transaction instead.

    Refuses Hive-partitioned layouts (``col=value`` subdirectories):
    a flat rewrite would silently demote partition directories to plain
    columns and lose pruning — compact each leaf partition directory
    instead.
    """
    import math
    import shutil

    from pyspark.sql.types import LongType

    parted = [
        d
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d)) and "=" in d
    ]
    if parted:
        raise ValueError(
            f"{path} is Hive-partitioned ({parted[:3]}…); compact each "
            "leaf partition directory, not the root (a flat rewrite "
            "would lose the partition layout)"
        )
    fs_size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fns in os.walk(path)
        for f in fns
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(fs_size / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true":
        # With the session-wide nanosAsLong contract (session.py), a
        # TIMESTAMP(NANOS) column reads back as LongType and a rewrite
        # would persist it as plain BIGINT — a silent on-disk type
        # demotion. Parquet footers are the source of truth here: refuse
        # when any physical column was read as nanos-as-long.
        import pyarrow.parquet as pq

        for dp, _, fns in os.walk(path):
            for f in fns:
                if not f.endswith(".parquet"):
                    continue
                arrow_schema = pq.read_schema(os.path.join(dp, f))
                for field in arrow_schema:
                    if "timestamp[ns" in str(field.type) and isinstance(
                        df.schema[field.name].dataType, LongType
                    ):
                        raise ValueError(
                            f"{path} column {field.name!r} is TIMESTAMP(NANOS) "
                            "read as BIGINT under the nanosAsLong contract; "
                            "compacting would demote it on disk. Rewrite it "
                            "with an explicit timestamp cast first."
                        )
                break  # one footer per directory is representative
    tmp = path.rstrip("/") + "._compact_tmp"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + "._compact_old"
    shutil.move(path, bak)
    try:
        shutil.move(tmp, path)
    except BaseException:
        # Crash window: the dataset must never be absent at `path`.
        # Restore the original before re-raising.
        if not os.path.exists(path):
            shutil.move(bak, path)
        raise
    shutil.rmtree(bak)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
