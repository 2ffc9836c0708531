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

NULL semantics: the carried payload is a STRUCT of all value columns
(non-null exactly on reference rows), so ``last(ignorenulls=True)``
skips only probe rows — a matched reference row whose value column is
legitimately NULL yields NULL, exactly like DuckDB's ASOF JOIN, rather
than leaking an older non-null value forward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TS, _TAG = "__asof_ts", "__asof_is_probe"
_VAL = "__asof_vals"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """For each ``left`` row, attach ``value_cols`` from the matching
    ``right`` row: with ``direction="backward"`` (default) the latest
    row with ``right_ts <= left_ts``; with ``"forward"`` the earliest
    row with ``right_ts >= left_ts`` (null when no such row). Output =
    all of ``left``'s columns plus ``{prefix}{c}`` per value column.

    Forward is the same single-window plan with the timestamp sort
    reversed — reference rows still sort before probe rows at equal
    ts, so equality matches in both directions."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    val_type = T.StructType([right.schema[c] for c in value_cols])
    tiebreaks = list(tiebreak_cols or [])
    clash = [c for c in tiebreaks if c in left.columns]
    if clash:
        raise ValueError(
            f"tiebreak_cols are reference-side columns; {clash} also "
            f"exist on the probe side — rename one side first"
        )

    probe = (
        left.withColumn(_TS, F.col(left_ts))
        .withColumn(_TAG, F.lit(1))
        .withColumn(_VAL, F.lit(None).cast(val_type))
    )
    # probe rows carry typed-null tiebreaks (they sort last within a
    # tag group, which is irrelevant — tag already separates them)
    for c in tiebreaks:
        probe = probe.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    ref = right.select(
        F.col(key),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias(_VAL),
        *[F.col(c) for c in tiebreaks],
    )
    # pad the reference side out to the probe schema with typed nulls
    for f in probe.schema.fields:
        if f.name not in ref.columns:
            ref = ref.withColumn(f.name, F.lit(None).cast(f.dataType))
    u = probe.unionByName(ref.select(*probe.columns))

    # reference rows sort BEFORE probe rows at equal ts -> equality
    # matches; descending ts turns "latest <=" into "earliest >="
    ts_order = F.col(_TS) if direction == "backward" else F.col(_TS).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, _TAG, *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn(_VAL, F.last(_VAL, ignorenulls=True).over(w))

    out = u.filter(F.col(_TAG) == 1)
    for c in value_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(_VAL).getField(c))
    return out.drop(_TS, _TAG, _VAL, *tiebreaks)
