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
