"""Headline analytical queries over the driver testdata (TPC-H-ish).

These are the scale-bearing workload: scan→filter→join→agg→sort
pipelines exercising the same operator surface the reference's DW
queries use (SURVEY.md §2.11: Q6 billed-vs-allowed-vs-paid rollup,
Q2/Q4 multi-way dim joins, Q7 LOS derivation ≙ date arithmetic).

Scale design notes (100 TB):
- every query is a single declarative plan — Catalyst pushes the date
  filters into the parquet scan and prunes columns;
- dim joins (region/nation/supplier/customer at TPC-H ratios) are
  broadcast-able; we hint ``broadcast()`` for the tiny ones so the plan
  never sort-merge-shuffles the fact on a dim lookup;
- aggregates are DECIMAL-exact → partial (map-side) aggregation is both
  legal and deterministic, so the shuffle carries pre-aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineer_project_spark.functions.numeric import money
from data_engineer_project_spark.queries.catalog import query

D12 = "decimal(12,2)"
D4 = "decimal(4,2)"


def _disc_price(li):
    # price*(1-disc) in exact decimals: (12,2)*(4,2) → (17,4)
    return li.l_extendedprice.cast(D12) * (F.lit(1) - li.l_discount).cast(D4)


def _charge(li):
    return _disc_price(li) * (F.lit(1) + li.l_tax).cast(D4)


_ORACLE_DISC_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
_ORACLE_CHARGE = _ORACLE_DISC_PRICE + " * CAST(1 + l_tax AS DECIMAL(4,2))"


@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_ORACLE_DISC_PRICE}) AS DOUBLE)                   AS sum_disc_price,
           CAST(SUM({_ORACLE_CHARGE}) AS DOUBLE)                       AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q1_pricing_summary(t):
    """TPC-H Q1 pricing summary: multi-agg groupBy with derived measures.

    Reference parity: SUM/AVG/COUNT multi-aggregate + GROUP BY + ORDER BY
    (`SQLQueryiesPractice.sql:70-88`), derived-measure rollup like billed
    vs allowed vs paid (`Claims & Encounters.sql:381-392`).
    """
    li = t.lineitem
    qty = money("l_quantity")
    price = money("l_extendedprice")
    disc = money("l_discount")
    return (
        li.filter(li.l_shipdate <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(_disc_price(li)).cast("double").alias("sum_disc_price"),
            F.sum(_charge(li)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(qty).cast("double")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(price).cast("double")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count(disc).cast("double")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(SUM({_ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "topk", "flagship"),
)
def q3_shipping_priority(t):
    """TPC-H Q3: selective fact-fact join + top-k by aggregate.

    Reference parity: inner join chain + TOP n ORDER BY
    (`SQLQueryiesPractice.sql:59-61,106-109`). The customer side is
    filtered then broadcast; deterministic tie-break on l_orderkey.
    """
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = t.orders.filter(F.col("o_orderdate") < "1996-03-15")
    li = t.lineitem.filter(F.col("l_shipdate") > "1996-03-15")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price(li)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, CAST(SUM({_ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "flagship"),
)
def q5_local_supplier_volume(t):
    """TPC-H Q5: 6-way snowflake join (region→nation→cust/supp→fact).

    Reference parity: the 5+-table mixed join of
    `ProviderNetwork.sql:254-270` and the snowflake dim hierarchy
    (`SnowflakeSchemaForHealthcare.sql`). Dims broadcast; the only big
    shuffle is lineitem⋈orders on orderkey.
    """
    region = t.region.filter(F.col("r_name") == "ASIA")
    nat = t.nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    sup = t.supplier.join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    ords = t.orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = t.lineitem
    cust = t.customer
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            cust,
            (ords.o_custkey == cust.c_custkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(_disc_price(li)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "flagship"),
)
def q6_forecast_revenue(t):
    """TPC-H Q6: pure scan-filter-aggregate (pushdown showcase).

    Reference parity: date-range + BETWEEN predicates
    (`SQLQueryiesPractice.sql:37-39`, `Claims & Encounters.sql:390`).
    All four predicates push into the parquet row-group scan.
    """
    li = t.lineitem
    return (
        li.filter(
            (li.l_shipdate >= "1996-01-01")
            & (li.l_shipdate < "1997-01-01")
            & (li.l_discount >= 0.05)
            & (li.l_discount <= 0.07)
            & (li.l_quantity < 24)
        )
        .agg(
            F.sum(li.l_extendedprice.cast(D12) * li.l_discount.cast(D4))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q4_priority_with_returns",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "semi", "agg"),
)
def q4_priority_with_returns(t):
    """TPC-H Q4 shape (adapted to available columns): EXISTS subquery →
    left_semi join, then count by priority. The semi-join never
    duplicates order rows, so no post-join distinct is needed — the
    planner keeps only the first match per key.

    Reference parity: EXISTS semi-join (`SQLQueryiesPractice.sql:177-182`).
    """
    ords = t.orders.filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    returned = t.lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        ords.join(returned, ords.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk"),
)
def q10_returned_items(t):
    """TPC-H Q10: returned-item revenue per customer, top 20. Fact
    filtered before the join (returnflag + date pushdown), nation
    broadcast, deterministic tie-break on custkey."""
    li = t.lineitem.filter(F.col("l_returnflag") == "R")
    ords = t.orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    cust = t.customer
    nat = t.nation
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price(li)).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "agg", "topk"),
)
def q18_large_volume_customers(t):
    """TPC-H Q18: aggregate subquery (orders whose total quantity
    exceeds a threshold) used as a semi-join filter — the derived-
    aggregate-join-back shape of `SQLQueryiesPractice.sql:147-159`.
    The HAVING aggregate is computed once, map-side-combined, then
    semi-joined; no correlated re-evaluation."""
    li = t.lineitem
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    ords = t.orders.join(big, t.orders.o_orderkey == big.l_orderkey, "left_semi")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(t.customer, ords.o_custkey == t.customer.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(money("l_quantity")).cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q14_promo_effect",
    f"""
    SELECT CAST(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                 THEN {_ORACLE_DISC_PRICE} ELSE CAST(0 AS DECIMAL(17,4)) END)
                / SUM({_ORACLE_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("join", "agg"),
)
def q14_promo_effect(t):
    """TPC-H Q14: conditional-aggregate ratio over a fact↔dim join —
    `SUM(CASE WHEN)` (`CareManagementCCA.sql:318-325`) as a revenue
    share. Exact-decimal numerator/denominator, one double division."""
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    joined = li.join(t.part, li.l_partkey == t.part.p_partkey)
    promo = F.when(
        F.col("p_type").like("PROMO%"), _disc_price(joined)
    ).otherwise(F.lit(0).cast("decimal(17,4)"))
    return joined.agg(
        (
            F.lit(100.0) * F.sum(promo).cast("double")
            / F.sum(_disc_price(joined)).cast("double")
        ).alias("promo_revenue_pct")
    )


@query(
    "q19_disjunctive_predicates",
    f"""
    SELECT CAST(SUM({_ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40))
    """,
    tags=("join", "filter"),
)
def q19_disjunctive_predicates(t):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — Catalyst
    splits the disjunction into per-side pushable conjuncts
    (l_quantity ranges push to lineitem, brand/size to part) and keeps
    the cross-side residual on the join."""
    li = t.lineitem
    p = t.part
    joined = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return joined.filter(cond).agg(
        F.sum(_disc_price(joined)).cast("double").alias("revenue")
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH thresh AS (
      SELECT l_partkey AS t_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE)) AS qty_cutoff
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem, part, thresh
    WHERE p_partkey = l_partkey AND t_partkey = p_partkey
      AND p_brand = 'Brand#23'
      AND l_quantity < qty_cutoff
    """,
    tags=("join", "agg", "subquery"),
)
def q17_small_quantity_revenue(t):
    """TPC-H Q17 shape: correlated aggregate subquery (per-part average
    quantity) decorrelated into an aggregate-then-join — the form
    Catalyst (and any 100 TB plan) wants: one partial-agg shuffle on
    l_partkey, then an equi-join instead of a per-row subquery. The
    cutoff is derived from an exact decimal sum so both engines filter
    on bit-identical doubles."""
    li = t.lineitem
    thresh = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1)).cast("double"))
        ).alias("qty_cutoff")
    ).withColumnRenamed("l_partkey", "t_partkey")
    p = t.part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresh, li.l_partkey == thresh.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
    )
    return joined.agg(
        (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
    )


@query(
    "q22_dormant_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS cutoff
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > cutoff
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
    tags=("agg", "anti-join", "subquery"),
)
def q22_dormant_customers(t):
    """TPC-H Q22 shape: global scalar aggregate as a filter bound +
    NOT EXISTS anti-join (customers with above-average balance and no
    order since 2000). The scalar is a 1-row DataFrame cross-joined in
    (broadcast, never collected to the driver); the anti-join plans
    natively as left_anti on o_custkey with the date predicate pushed
    into the orders scan."""
    c = t.customer
    cutoff = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "cutoff"
        )
    )
    rich = c.crossJoin(F.broadcast(cutoff)).filter(F.col("c_acctbal") > F.col("cutoff"))
    recent = t.orders.filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    dormant = rich.join(recent, rich.c_custkey == F.col("o_custkey"), "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
    )


@query(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM({_ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q7_volume_shipping(t):
    """TPC-H Q7 shape: revenue between a nation pair by ship year —
    a 6-table join where both nation dims broadcast and the
    disjunctive pair predicate applies post-join (it references both
    sides). Fact tables meet in one sort-merge on the orderkey."""
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = t.lineitem
    j = (
        li.join(t.supplier, li.l_suppkey == t.supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(t.orders, li.l_orderkey == t.orders.o_orderkey)
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_disc_price(li)).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             {_ORACLE_DISC_PRICE} AS volume,
             n1.n_name AS nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE p_type = (SELECT MIN(p_type) FROM part)
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "agg", "subquery"),
)
def q8_market_share(t):
    """TPC-H Q8 shape: one nation's share of yearly revenue for a part
    type — conditional-aggregate ratio over a 5-table join. The part
    type is itself a scalar subquery (deterministic MIN) broadcast into
    the part filter, so the fact scan is pruned by a semi-joined dim
    both engines resolve identically."""
    part_type = t.part.agg(F.min("p_type").alias("sel_type"))
    p = (
        t.part.join(F.broadcast(part_type), t.part.p_type == F.col("sel_type"))
        .select("p_partkey")
    )
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    li = t.lineitem
    j = (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(t.supplier, li.l_suppkey == t.supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(t.orders, li.l_orderkey == t.orders.o_orderkey)
    )
    vol = _disc_price(li)
    asia = F.when(F.col("nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(17,4)")
    )
    return (
        j.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            (F.sum(asia).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Round 5: the nine remaining TPC-H query shapes.  The driver testdata has
# no ``partsupp`` table (TESTDATA.md), so Q2/Q11/Q16/Q20 use ``lineitem``
# as the part-supplier bridge — the join/subquery SHAPE (correlated scalar
# min, HAVING vs global-fraction scalar, NOT IN + COUNT DISTINCT, nested
# semi-join chain) is preserved exactly; only the bridge relation differs.
# Q12/Q21 derive lateness from l_shipdate vs o_orderdate (no
# l_commitdate/l_receiptdate in the data) and Q13 filters on
# o_orderpriority (no o_comment).  Reference parity: these complete the
# scan→join→agg→subquery surface of SURVEY.md §2.2-§2.4/§2.11.
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS offer
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), sel AS (
      SELECT p_partkey, l_suppkey, offer,
             MIN(offer) OVER (PARTITION BY p_partkey) AS best
      FROM offers JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'SMALL' AND p_size <= 15
    )
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(offer AS DOUBLE) AS offer_price
    FROM sel
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE offer = best
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "subquery", "topk"),
)
def q2_min_cost_supplier(t):
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) whose
    best offer equals the part's global minimum offer — a correlated
    scalar-min subquery realized as min-per-part joined back on
    (partkey, exact DECIMAL equality). lineitem is the part-supplier
    bridge (no partsupp in the testdata). Scale: the offer table
    aggregates map-side then shuffles once on (partkey, suppkey); the
    per-part min is a WINDOW over that aggregate — not a groupBy +
    join-back, which would recompute the offers subtree and scan
    lineitem twice; part/supplier/nation dims broadcast. Ref parity:
    SURVEY §2.3 composite-key joins + §2.10 scalar subqueries."""
    li = t.lineitem
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(money("l_extendedprice")).alias("offer")
    )
    parts = t.part.filter((F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)).select(
        "p_partkey"
    )
    offers_p = offers.join(F.broadcast(parts), offers.l_partkey == F.col("p_partkey"))
    sel = offers_p.withColumn(
        "best", F.min("offer").over(Window.partitionBy("p_partkey"))
    ).filter(F.col("offer") == F.col("best"))
    out = (
        sel.join(F.broadcast(t.supplier), sel.l_suppkey == t.supplier.s_suppkey)
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("offer").cast("double").alias("offer_price"),
        )
    )
    return out.orderBy(
        F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
    ).limit(100)


@query(
    "q9_product_type_profit",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             EXTRACT(year FROM o_orderdate) AS o_year,
             {_ORACLE_DISC_PRICE}
               - CAST(0.9 AS DECIMAL(3,2)) * CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2)) AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("join", "agg"),
)
def q9_product_type_profit(t):
    """TPC-H Q9 shape: profit by supplier nation and order year over
    parts matching a name pattern. Supply cost proxies as
    0.9 x p_retailprice x quantity (no partsupp.ps_supplycost in the
    testdata); the whole amount stays DECIMAL-exact so partial
    aggregation is order-independent. Scale: the LIKE filter prunes
    part before it broadcasts into the fact scan; nation broadcasts;
    the lineitem-orders join is the lone fact-fact sort-merge. Ref
    parity: SURVEY §2.4 derived-measure rollups."""
    li = t.lineitem
    p = t.part.filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(t.supplier), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t.orders, li.l_orderkey == F.col("o_orderkey"))
    )
    cost = (
        F.lit(0.9).cast("decimal(3,2)")
        * money("p_retailprice")
        * money("l_quantity")
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (_disc_price(li) - cost).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@query(
    "q11_important_part_value",
    """
    WITH natline AS (
      SELECT l_partkey,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l_discount AS DECIMAL(4,2)) AS val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_19'
    )
    SELECT l_partkey AS p_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
    FROM natline
    GROUP BY l_partkey
    HAVING CAST(SUM(val) AS DECIMAL(30,4)) * (SELECT CAST(COUNT(DISTINCT l_partkey) AS DECIMAL(6,0)) FROM natline)
         > (SELECT CAST(SUM(val) AS DECIMAL(30,4)) FROM natline) * CAST(2 AS DECIMAL(1,0))
    ORDER BY part_value DESC, p_partkey
    """,
    tags=("agg", "subquery"),
)
def q11_important_part_value(t):
    """TPC-H Q11 shape: per-part value of one nation's supply, keeping
    only parts above a threshold of the nation's total — a HAVING
    clause against a global scalar subquery. Value proxies as
    discounted lineitem revenue (no partsupp), and where TPC-H scales
    its fraction by 1/SF, the threshold here is scale-invariant by
    construction: keep parts worth more than 2x the average part
    value, written as the cross-multiplication
    ``value * n_parts > total * 2`` so both engines compare exact
    DECIMALs (no division, no floats; DECIMAL(30,4) x DECIMAL(6,0)
    stays under both engines' 38-digit cap for corpora to 10^6
    distinct parts per nation at test scale). Scale: one shuffle on
    partkey with map-side partial sums; the global total/count derives
    from the per-part aggregate itself (sum-of-sums, count-of-groups)
    so the natline subtree is computed once and its shuffle exchange
    is reused, and the scalar stays a 1-row Aggregate(keys=[])
    broadcast — never a collect. Ref parity: SURVEY §2.4 HAVING +
    §2.10 scalar subqueries."""
    li = t.lineitem
    supp = (
        t.supplier.join(
            F.broadcast(t.nation.filter(F.col("n_name") == "NATION_19")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    natline = li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey")).select(
        "l_partkey", _disc_price(li).alias("val")
    )
    per_part = natline.groupBy("l_partkey").agg(F.sum("val").alias("value"))
    total = per_part.agg(
        (
            F.sum("value").cast("decimal(30,4)") * F.lit(2).cast("decimal(1,0)")
        ).alias("cutoff"),
        F.count(F.lit(1)).cast("decimal(6,0)").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value").cast("decimal(30,4)") * F.col("n_parts") > F.col("cutoff")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@query(
    "q12_late_shipment_priority",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("join", "agg"),
)
def q12_late_shipment_priority(t):
    """TPC-H Q12 shape: for lineitems shipped late (>=90 days after
    the order date, a timestamp-arithmetic join predicate), count
    high- vs low-priority orders per category. l_returnflag stands in
    for l_shipmode and ship-vs-order lateness for commit-vs-receipt
    (columns absent from the testdata). Scale: the year filter pushes
    into the lineitem scan; the lateness predicate evaluates post-join
    (it references both sides); conditional counts partial-aggregate
    map-side. Ref parity: SURVEY §2.4 conditional aggregation
    (CASE-in-SUM, ≙ hq09)."""
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    j = li.join(t.orders, li.l_orderkey == F.col("o_orderkey")).filter(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg"),
)
def q13_order_count_distribution(t):
    """TPC-H Q13: distribution of per-customer order counts, with the
    join predicate (not a WHERE) excluding one priority class so
    order-less customers still appear with c_count = 0. The priority
    filter stands in for o_comment NOT LIKE (no comment column).
    Scale: two cascaded aggregations, each with map-side partials; the
    left join shuffles on custkey once and the second groupBy is on a
    low-cardinality count. Ref parity: SURVEY §2.3 left outer join +
    §2.4 nested aggregation."""
    orders = t.orders.filter(F.col("o_orderpriority") != "5-LOW").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t.customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_ORACLE_DISC_PRICE}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("agg", "subquery"),
)
def q15_top_supplier(t):
    """TPC-H Q15: the supplier(s) with maximum revenue in a 3-month
    ship window — the revenue view is computed once and compared
    against its own scalar MAX (exact DECIMAL equality, so ties are
    deterministic on both engines). Scale: one shuffle on suppkey;
    the max is a global WINDOW over the already-aggregated revenue
    table — |suppliers| rows, bounded — so lineitem is scanned ONCE
    (a cross-join against a separate agg would recompute the revenue
    subtree and re-scan the fact); supplier joins broadcast. Ref
    parity: SURVEY §2.9 views (the revenue CTE is the view body) +
    §2.10 scalar subqueries."""
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price(li)).alias("total_revenue")
    )
    return (
        revenue.withColumn(
            "mx", F.max("total_revenue").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(t.supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_part_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) bridge
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "agg", "anti-join"),
)
def q16_part_supplier_variety(t):
    """TPC-H Q16 shape: how many distinct suppliers can furnish each
    (brand, type, size) bucket, excluding flagged suppliers via NOT
    IN. lineitem's distinct (partkey, suppkey) pairs stand in for
    partsupp; negative account balance stands in for the complaints
    LIKE. Scale: the distinct-pairs projection prunes to 2 columns
    before shuffling; the NOT IN is a broadcast anti-join on a
    handful of keys (s_suppkey is never NULL, so anti-join ≡ NOT IN);
    part broadcasts into the bridge. Ref parity: SURVEY §2.3 anti
    joins + §2.4 COUNT DISTINCT."""
    bridge = t.lineitem.select("l_partkey", "l_suppkey").distinct()
    flagged = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t.part.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        bridge.join(
            F.broadcast(flagged),
            bridge.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_excess_share_supplier",
    """
    WITH ship97 AS (
      SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ), per_ps AS (
      SELECT l_partkey, l_suppkey, SUM(qty) AS supp_qty
      FROM ship97 GROUP BY l_partkey, l_suppkey
    ), per_p AS (
      SELECT l_partkey, SUM(qty) AS part_qty FROM ship97 GROUP BY l_partkey
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT DISTINCT per_ps.l_suppkey
      FROM per_ps JOIN per_p ON per_ps.l_partkey = per_p.l_partkey
      WHERE supp_qty > part_qty * CAST(0.3 AS DECIMAL(2,1))
    )
    ORDER BY s_name
    """,
    tags=("join", "subquery", "semi-join"),
)
def q20_excess_share_supplier(t):
    """TPC-H Q20 shape: suppliers who dominate (>30% of the shipped
    volume of) some qualifying part in 1997 — the nested
    IN(SELECT...WHERE qty > fraction-of-correlated-total) chain,
    with shipped share standing in for availqty-vs-half-of-shipped
    (no partsupp). The share comparison is DECIMAL-exact (the
    per-part total is the window-sum of the per-(part, supplier)
    sums — algebraically identical to summing raw quantities). Scale:
    ship97 aggregates ONCE on (partkey, suppkey) and the per-part
    total is a window over that aggregate partitioned by partkey —
    not a second groupBy + join-back, which would recompute ship97
    and scan lineitem twice; the window key (suppliers per part) is
    bounded; the final IN is a semi-join into the 100-row supplier
    dim. Ref parity: SURVEY §2.3 semi joins + §2.10 nested
    subqueries."""
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    parts = t.part.filter(F.col("p_name").like("small%")).select("p_partkey")
    ship97 = li.join(F.broadcast(parts), li.l_partkey == F.col("p_partkey")).select(
        "l_partkey", "l_suppkey", money("l_quantity").alias("qty")
    )
    per_ps = ship97.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("supp_qty")
    )
    dominating = (
        per_ps.withColumn(
            "part_qty", F.sum("supp_qty").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("supp_qty") > F.col("part_qty") * F.lit(0.3).cast("decimal(2,1)"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t.supplier.join(
            F.broadcast(dominating),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_supplier",
    """
    WITH base AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM base l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.is_late = 1
      AND EXISTS (SELECT 1 FROM base l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM base l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 50
    """,
    tags=("join", "semi-join", "anti-join", "agg"),
)
def q21_waiting_supplier(t):
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order — the double correlated
    EXISTS / NOT EXISTS. The DataFrame plan applies the decorrelation
    a cost-based optimizer would: instead of two self-join legs that
    each recompute (and re-scan) the lineitem-orders base, aggregate
    once per (orderkey, suppkey) — keeping the late-lineitem count as
    the EXISTS semantics' row weight — then resolve both correlated
    predicates with ONE window over orderkey (participant count >= 2,
    exactly one late supplier). Lateness derives from l_shipdate >
    o_orderdate + 60 days (no commit/receipt dates in the testdata).
    Scale: lineitem is scanned once (the naive semi+anti form scans it
    three times); one shuffle on (orderkey, suppkey), one window
    re-shuffle on orderkey whose partitions are bounded by suppliers-
    per-order; supplier broadcasts; numwait still counts late
    lineitems exactly like the reference query. Ref parity: SURVEY
    §2.3 semi/anti joins (≙ hq17-hq19) at their hardest composition,
    decorrelated."""
    f_orders = t.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    base = li.join(f_orders, li.l_orderkey == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .cast("int")
        .alias("is_late"),
    )
    sup_order = base.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("is_late").alias("n_late_rows"),
        F.max("is_late").alias("any_late"),
    )
    w = Window.partitionBy("l_orderkey")
    sole_late = (
        sup_order.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late_supp", F.sum("any_late").over(w))
        .filter(
            (F.col("any_late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        sole_late.join(
            F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(50)
    )
