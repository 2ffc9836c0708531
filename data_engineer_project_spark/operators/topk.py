"""Distributed grouped top-k: two-phase top-k for few-group workloads.

A single window ``row_number() <= k`` per group sends the ENTIRE input
to one reducer per group — with few groups (e.g. 10 ANN queries
against a 100 TB corpus) that is 10 reducers each receiving and
sorting the whole scored corpus while the rest of the cluster idles.

Two-phase form:

  phase 1: rank within (group, input-partition-id): the shuffle moves
           the same bytes but spreads them over groups × partitions
           reducers (full cluster parallelism, bounded per-reducer
           sort), and only each slice's k best survive;
  phase 2: rank the survivors per group — ≤ k · n_partitions rows per
           group, a trivially small final shuffle and sort.

Requires a TOTAL order (include a unique tie-break column) so the
result is row-identical to the single-window form at any partitioning
— asserted by property test against the window implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__topk_pid"
_RN = "__topk_rn"


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
) -> DataFrame:
    """Top ``k`` rows per group under ``order_cols`` (must be a total
    order — include a unique tie-break column, e.g. ``[F.desc("score"),
    F.asc("id")]``). Returns ``df``'s columns; row set identical to the
    naive per-group window top-k."""
    payload = list(df.columns)
    staged = df.withColumn(_PID, F.spark_partition_id())
    w1 = Window.partitionBy(*group_cols, _PID).orderBy(*order_cols)
    local = (
        staged.withColumn(_RN, F.row_number().over(w1))
        .filter(F.col(_RN) <= k)
        .drop(_RN, _PID)
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        local.withColumn(_RN, F.row_number().over(w2))
        .filter(F.col(_RN) <= k)
        .drop(_RN)
        .select(*payload)
    )
