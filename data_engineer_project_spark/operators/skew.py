"""Skew-mitigation operators.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin.enabled``,
on by default in `session.py`) splits oversized sort-merge partitions
at runtime and is the first line of defense. Salting is the explicit
fallback for the cases AQE can't fix — skewed *aggregation* keys, or a
broadcast-ineligible dimension joined on a hot key: fan the hot key out
across ``salts`` synthetic sub-keys so no single task owns it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Equi-join with the large side salted across ``salts`` sub-keys.

    The large side gets a deterministic salt (hash of ``salt_by``, a
    high-cardinality column — default: the join key itself, which still
    spreads rows when the *distribution* is skewed but keys are many);
    the small side is replicated ``salts``× so every (key, salt) pair
    finds its match. For the supported ``how`` values the result is
    row-identical to ``large.join(small, on, how)`` — only the shuffle
    layout changes. ``right``/``full`` are rejected: the replicated
    small side would emit each unmatched small row ``salts``× with
    nulls instead of once.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            "salted_join preserves row-identity only for how in "
            f"('inner','left','left_semi','left_anti'); got {how!r}"
        )
    salt_col = F.pmod(F.xxhash64(F.col(salt_by or on)), F.lit(salts))
    salted_large = large.withColumn(SALT, salt_col)
    replicated_small = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(s) for s in range(salts)]))
    )
    return salted_large.join(replicated_small, [on, SALT], how).drop(SALT)


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: list,
    salts: int = 16,
    salt_by: str | None = None,
):
    """Two-phase aggregation for skewed group keys: pre-aggregate on
    (group, salt), then merge. Caller supplies *decomposable* partial
    and final aggregate pairs via ``aggs`` as (partial_expr, final_fn,
    name) tuples — e.g. (F.sum(c), F.sum, "total").

    Spark already does map-side partial aggregation; explicit salting
    additionally splits the *reduce* side of a hot group across tasks.
    ``salt_by`` must vary WITHIN a group (a high-cardinality detail
    column); default is the physical partition id, which always does —
    any salt choice merges to identical final results.
    """
    salt_col = (
        F.pmod(F.xxhash64(F.col(salt_by)), F.lit(salts))
        if salt_by
        else F.spark_partition_id() % salts
    )
    partial = (
        df.withColumn(SALT, salt_col)
        .groupBy(*group_cols, SALT)
        .agg(*[p.alias(f"__p_{name}") for p, _fn, name in aggs])
    )
    return partial.groupBy(*group_cols).agg(
        *[fn(F.col(f"__p_{name}")).alias(name) for _p, fn, name in aggs]
    )
