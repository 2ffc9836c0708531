"""As-of (point-in-time) join — the classic time-series operator Spark
lacks as a primitive, built as a composition of existing DataFrame ops
(SURVEY custom-operator tier (a): no UDF needed). No counterpart in the
reference (its joins are all equi/theta, SURVEY §2.3); this is a
north-star extension for event/time-series analytics.

Implementation: union-then-window, the shuffle-minimal form —
  1. tag probe (left) and reference (right) rows and union them;
  2. ONE window per key ordered by (ts, tag): ``last(value,
     ignorenulls=True)`` carries the latest at-or-before reference
     value onto each probe row;
  3. keep probe rows.
That is a single shuffle on the key (the window sort) and zero joins —
versus the naive per-key range join, which is quadratic in rows-per-key
and plans as a broadcast-nested-loop at scale. At 100 TB the window
form is a plain repartition-and-sort: AQE handles key skew, and no
build side ever needs to fit in memory.

Tie semantics: a reference row at exactly the probe timestamp matches
(``<=``, i.e. backward as-of), same as DuckDB's native ``ASOF JOIN``
used by the oracle twin. If the reference side has several rows at the
same (key, ts) the carried value is the one latest in the (ts, tag,
tiebreak) sort — pass ``tiebreak_cols`` or pre-aggregate duplicates to
make that deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS, _TAG = "__asof_ts", "__asof_is_probe"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each ``left`` row, attach ``value_cols`` from the latest
    ``right`` row with the same ``key`` and ``right_ts <= left_ts``
    (null when no such row). Output = all of ``left``'s columns plus
    ``{prefix}{c}`` for each value column."""
    carried = [f"__asof_v_{c}" for c in value_cols]

    probe = left.withColumn(_TS, F.col(left_ts)).withColumn(_TAG, F.lit(1))
    for c, cc in zip(value_cols, carried):
        probe = probe.withColumn(cc, F.lit(None).cast(right.schema[c].dataType))

    ref = right.select(
        F.col(key),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        *[F.col(c).alias(cc) for c, cc in zip(value_cols, carried)],
    )
    # pad the reference side out to the probe schema with typed nulls
    for f in probe.schema.fields:
        if f.name not in ref.columns:
            ref = ref.withColumn(f.name, F.lit(None).cast(f.dataType))
    u = probe.unionByName(ref.select(*probe.columns))

    # reference rows sort BEFORE probe rows at equal ts -> <= semantics
    w = (
        Window.partitionBy(key)
        .orderBy(_TS, _TAG, *(tiebreak_cols or []))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for cc in carried:
        u = u.withColumn(cc, F.last(cc, ignorenulls=True).over(w))

    out = u.filter(F.col(_TAG) == 1)
    for c, cc in zip(value_cols, carried):
        out = out.withColumnRenamed(cc, f"{prefix}{c}")
    return out.drop(_TS, _TAG)
