"""Window functions (SURVEY §2.5): absent in the reference, but the
capability-equivalent spots it implies — surrogate-key assignment
(IDENTITY), latest-per-member by EffectiveDate, OFFSET pagination —
plus the standard ranking/offset/frame surface as extensions.

Scale notes: every window here partitions by a real key (custkey etc.)
so work distributes; the one global window (surrogate keys on a dim)
is explicitly documented as dim-scale-only, matching SURVEY §7
hard-part 1.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineer_project_spark.functions.numeric import money
from data_engineer_project_spark.queries.catalog import query


@query(
    "p37_surrogate_key",
    """
    SELECT n_nationkey, n_name,
           CAST(ROW_NUMBER() OVER (ORDER BY n_name, n_nationkey) AS BIGINT) AS nation_sk
    FROM nation
    """,
    tags=("window", "etl"),
)
def p37_surrogate_key(t):
    """IDENTITY surrogate-key assignment (`Members&EligibilitySource.
    sql:15`) as deterministic row_number over the business key — NOT
    monotonically_increasing_id (non-contiguous, partition-dependent).
    Single-partition window is fine at dim scale only; fact-scale keys
    use zipWithIndex-free approaches (hash or precomputed ranges)."""
    w = Window.orderBy("n_name", "n_nationkey")
    return t.nation.select(
        "n_nationkey", "n_name", F.row_number().over(w).cast("long").alias("nation_sk")
    )


@query(
    "p38_latest_per_group",
    """
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    tags=("window",),
)
def p38_latest_per_group(t):
    """Latest-row-per-entity (`CareManagementCCA.sql:84-92` latest risk
    score per member by EffectiveDate): partitioned row_number, rn=1.
    Distributes by the partition key; no global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        t.orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@query(
    "p39_rank_within_group",
    """
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(RANK() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank,
             CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_dense_rank
      FROM orders
    ) WHERE price_rank <= 3
    """,
    tags=("window", "topk"),
)
def p39_rank_within_group(t):
    """RANK/DENSE_RANK top-n per group — windowed top-k, the scalable
    form of per-group TOP (SURVEY §2.5 extension)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t.orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("price_rank"),
            F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )


@query(
    "p40_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS INT) AS days_since_prev,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_orderkey
    FROM orders WHERE o_custkey < 50
    """,
    tags=("window",),
)
def p40_lag_lead(t):
    """LAG/LEAD offsets: inter-event gap per entity (reorder-interval
    analysis; SURVEY §2.5 extension)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = t.orders.filter(F.col("o_custkey") < 50)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "p41_moving_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_3_sum,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders WHERE o_custkey < 50
    """,
    tags=("window", "agg"),
)
def p41_moving_sum(t):
    """Frame-bounded windowed aggregation: 3-row moving sum + running
    total per entity (SURVEY §2.5 extension). Exact decimals keep the
    running values order-independent within the mandated frame order."""
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = base.rowsBetween(-2, 0)
    wrun = base.rowsBetween(Window.unboundedPreceding, 0)
    o = t.orders.filter(F.col("o_custkey") < 50)
    tp = money("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(tp).over(w3).cast("double").alias("moving_3_sum"),
        F.sum(tp).over(wrun).cast("double").alias("running_total"),
    )


@query(
    "p36_offset_pagination_window",
    """
    SELECT o_orderkey, o_totalprice FROM (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn BETWEEN 2 AND 4
    """,
    tags=("window", "topk"),
)
def p36_offset_pagination_window(t):
    """OFFSET/FETCH pagination via row_number filtering
    (`SQLQueryiesPractice.sql:64-67` mapped per SURVEY §2.5) — the
    window form of p44_offset_fetch.

    Scale shape: a bare global ROW_NUMBER() sorts the whole table in
    ONE partition. Instead take the page's upper bound first —
    orderBy + limit plans as TakeOrderedAndProject, a distributed
    partial top-k — and run the global window over just those rows, so
    the single-partition sort touches page-size rows, not the table."""
    order = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    page_hi = t.orders.select("o_orderkey", "o_totalprice").orderBy(*order).limit(4)
    w = Window.orderBy(*order)
    return (
        page_hi.select(
            "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn").between(2, 4))
        .select("o_orderkey", "o_totalprice")
    )
