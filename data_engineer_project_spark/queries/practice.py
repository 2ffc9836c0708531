"""P-catalog: the reference's complete relational operator surface
(SURVEY.md §2.2–2.4, §2.6–2.9; `SQLQueryiesPractice.sql:5-244`),
re-expressed over the driver testdata with DuckDB oracle twins.

Each query name maps to one operator row of the SURVEY §2 inventory;
docstrings cite the reference file:line the operator comes from.
Everything here is a single declarative DataFrame plan — Catalyst
handles pushdown/pruning/join strategy; no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineer_project_spark.functions.numeric import money
from data_engineer_project_spark.queries.catalog import query

D12 = "decimal(12,2)"


# ---------------------------------------------------------------- §2.2
# Projection / filter / predicates


@query(
    "p01_select_project",
    "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    tags=("projection",),
)
def p01_select_project(t):
    """Column-list projection with alias (`SQLQueryiesPractice.sql:5-6`).
    Column pruning: the scan reads exactly these three columns."""
    return t.customer.alias("c").select("c_custkey", "c_name", "c_mktsegment")


@query("p02_select_star", "SELECT * FROM nation", tags=("projection",))
def p02_select_star(t):
    """SELECT * (`SQLQueryiesPractice.sql:13`)."""
    return t.nation.select("*")


@query(
    "p03_filter_and",
    "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000",
    tags=("filter",),
)
def p03_filter_and(t):
    """WHERE with AND (`SQLQueryiesPractice.sql:9-11`); both predicates
    push down to the parquet scan."""
    c = t.customer
    return c.filter((c.c_mktsegment == "BUILDING") & (c.c_acctbal > 5000)).select(
        "c_custkey", "c_name"
    )


@query(
    "p04_and_or_parens",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
    WHERE (c_mktsegment = 'BUILDING' AND c_acctbal > 7500) OR c_mktsegment = 'AUTOMOBILE'
    """,
    tags=("filter",),
)
def p04_and_or_parens(t):
    """AND/OR precedence with parens (`SQLQueryiesPractice.sql:48-51`)."""
    c = t.customer
    return c.filter(
        ((c.c_mktsegment == "BUILDING") & (c.c_acctbal > 7500))
        | (c.c_mktsegment == "AUTOMOBILE")
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


@query(
    "p05_like_prefix",
    "SELECT p_partkey, p_name FROM part WHERE p_name LIKE 'red %'",
    tags=("filter",),
)
def p05_like_prefix(t):
    """LIKE prefix pattern (`SQLQueryiesPractice.sql:27-29`); StartsWith
    pushes to the scan."""
    return t.part.filter(F.col("p_name").like("red %")).select("p_partkey", "p_name")


@query(
    "p06_in_list",
    "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus IN ('F','P')",
    tags=("filter",),
)
def p06_in_list(t):
    """IN list (`SQLQueryiesPractice.sql:32-34`)."""
    return t.orders.filter(F.col("o_orderstatus").isin("F", "P")).select(
        "o_orderkey", "o_orderstatus"
    )


@query(
    "p07_between_dates",
    """
    SELECT o_orderkey, o_orderdate FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'
    """,
    tags=("filter",),
)
def p07_between_dates(t):
    """BETWEEN on dates (`SQLQueryiesPractice.sql:37-39`)."""
    return t.orders.filter(
        F.col("o_orderdate").between("1996-01-01", "1996-03-31")
    ).select("o_orderkey", "o_orderdate")


@query(
    "p08_null_checks",
    """
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_final
    FROM orders
    WHERE NULLIF(o_orderstatus, 'P') IS NULL
    """,
    tags=("filter", "nulls"),
)
def p08_null_checks(t):
    """IS NULL / IS NOT NULL (`SQLQueryiesPractice.sql:42-44`). The
    testdata has no stored NULLs, so NULLIF manufactures them — same
    3VL filter semantics."""
    o = t.orders.withColumn(
        "status_final", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    return o.filter(F.col("status_final").isNull()).select("o_orderkey", "status_final")


@query(
    "p09_halfopen_range",
    """
    SELECT COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
    tags=("filter",),
)
def p09_halfopen_range(t):
    """Half-open date range (`Claims & Encounters.sql:390`)."""
    li = t.lineitem
    return li.filter(
        (li.l_shipdate >= "1997-01-01") & (li.l_shipdate < "1997-02-01")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "p10_case_banding",
    """
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'HIGH'
                WHEN o_totalprice >= 100000 THEN 'MEDIUM'
                ELSE 'LOW' END AS price_band,
           COUNT(*) AS n
    FROM orders GROUP BY 1 ORDER BY 2 DESC
    """,
    tags=("projection",),
)
def p10_case_banding(t):
    """CASE WHEN banding (`SQLQueryiesPractice.sql:95-102`)."""
    o = t.orders
    band = (
        F.when(o.o_totalprice >= 300000, "HIGH")
        .when(o.o_totalprice >= 100000, "MEDIUM")
        .otherwise("LOW")
    )
    return (
        o.select(band.alias("price_band"))
        .groupBy("price_band")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
    )


@query(
    "p11_distinct",
    "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    tags=("projection",),
)
def p11_distinct(t):
    """DISTINCT (`SQLQueryiesPractice.sql:21-22`): hash-aggregate
    shuffle on the projected keys, partial-agg map-side first."""
    return t.customer.select("c_nationkey", "c_mktsegment").distinct()


# ---------------------------------------------------------------- §2.3
# Joins


@query(
    "p12_inner_join_2way",
    """
    SELECT c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice > 400000
    """,
    tags=("join",),
)
def p12_inner_join_2way(t):
    """Inner equi-join (`SQLQueryiesPractice.sql:106-109`). Selective
    order-side filter first, so the join input is small."""
    o = t.orders.filter(F.col("o_totalprice") > 400000)
    return o.join(t.customer, o.o_custkey == t.customer.c_custkey).select(
        "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "p13_inner_3way_chain",
    """
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("join",),
)
def p13_inner_3way_chain(t):
    """3-way chain join (`Members&EligibilitySource.sql:265-273`
    enrollment→member→plan→payer). nation/region broadcast."""
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "p14_left_join_count",
    """
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_big_orders
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join", "nulls"),
)
def p14_left_join_count(t):
    """LEFT JOIN + COUNT(col) counting only matches — zero-preserved
    (`SQLQueryiesPractice.sql:112-116`)."""
    big = t.orders.filter(F.col("o_totalprice") > 450000)
    return (
        t.customer.join(big, t.customer.c_custkey == big.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("n_big_orders"))
    )


@query(
    "p15_right_join",
    """
    SELECT n.n_name, s.s_suppkey
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    tags=("join", "nulls"),
)
def p15_right_join(t):
    """RIGHT OUTER JOIN (`SQLQueryiesPractice.sql:120-122`): every
    nation kept even with no supplier (s_suppkey NULL)."""
    s = t.supplier
    n = t.nation
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "n_name", "s_suppkey"
    )


@query(
    "p16_full_outer_join",
    """
    SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    """,
    tags=("join", "nulls"),
)
def p16_full_outer_join(t):
    """FULL OUTER JOIN (`SQLQueryiesPractice.sql:125-127`)."""
    c = t.customer.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = t.supplier.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return c.join(s, c.nk == s.nk, "full_outer").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "p17_cross_join_top",
    """
    SELECT r.r_name, o.o_orderkey
    FROM region r
    CROSS JOIN (SELECT o_orderkey FROM orders ORDER BY o_orderkey DESC LIMIT 2) o
    """,
    tags=("join",),
)
def p17_cross_join_top(t):
    """CROSS JOIN with TOP-limited derived table
    (`SQLQueryiesPractice.sql:131-133`)."""
    top2 = t.orders.orderBy(F.desc("o_orderkey")).limit(2).select("o_orderkey")
    return t.region.crossJoin(top2).select("r_name", "o_orderkey")


@query(
    "p18_theta_self_join",
    """
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b
    FROM supplier a JOIN supplier b
      ON a.s_acctbal > b.s_acctbal AND a.s_suppkey > b.s_suppkey
    """,
    tags=("join",),
)
def p18_theta_self_join(t):
    """Self theta (non-equi) join (`SQLQueryiesPractice.sql:137-140`).
    Plans as BroadcastNestedLoopJoin — we broadcast the smaller alias so
    it never cartesian-shuffles at scale (SURVEY §7 hard-part 7)."""
    a = t.supplier.alias("a")
    b = F.broadcast(t.supplier.alias("b"))
    return a.join(
        b,
        (F.col("a.s_acctbal") > F.col("b.s_acctbal"))
        & (F.col("a.s_suppkey") > F.col("b.s_suppkey")),
    ).select(F.col("a.s_suppkey").alias("supp_a"), F.col("b.s_suppkey").alias("supp_b"))


@query(
    "p19_composite_key_join",
    """
    SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey AND l.l_linenumber = 1
    WHERE o.o_totalprice > 420000
    """,
    tags=("join",),
)
def p19_composite_key_join(t):
    """Composite-key equi-join + seq=1 residual, mirroring the claim
    line↔procedure ProcSeq=1 pattern (`Claims & Encounters.sql:373-377`,
    `StarSchemaForHealthcare.sql:322-327`)."""
    o = t.orders.filter(F.col("o_totalprice") > 420000)
    li = t.lineitem.filter(F.col("l_linenumber") == 1)
    return o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_linenumber", "l_extendedprice"
    )


@query(
    "p20_expr_key_join",
    """
    SELECT d.date_sk, COUNT(*) AS n_orders
    FROM orders o
    JOIN (SELECT DISTINCT o_orderdate AS d,
                 year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS date_sk
          FROM orders) d
      ON year(o.o_orderdate)*10000 + month(o.o_orderdate)*100 + day(o.o_orderdate) = d.date_sk
    GROUP BY d.date_sk
    """,
    tags=("join", "dates"),
)
def p20_expr_key_join(t):
    """Join on computed DateSK expression (`StarSchemaForHealthcare.
    sql:334`): fact joins the date dim on yyyy*10000+mm*100+dd."""
    o = t.orders
    sk = (
        F.year("o_orderdate") * 10000
        + F.month("o_orderdate") * 100
        + F.dayofmonth("o_orderdate")
    )
    dim = (
        o.select(F.col("o_orderdate").alias("d"))
        .distinct()
        .select("d", (F.year("d") * 10000 + F.month("d") * 100 + F.dayofmonth("d")).alias("date_sk"))
    )
    return (
        o.join(F.broadcast(dim), sk == dim.date_sk)
        .groupBy("date_sk")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "p21_coalesce_key_join",
    """
    SELECT n.n_name, COUNT(*) AS n_orders
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
      ON o.o_custkey = c.c_custkey
    JOIN nation n ON n.n_nationkey = COALESCE(c.c_nationkey, 0)
    GROUP BY n.n_name
    """,
    tags=("join", "nulls"),
)
def p21_coalesce_key_join(t):
    """Join with COALESCE fallback key (`StarSchemaForHealthcare.sql:330`
    provider NPI from line else header; here: nation from rich customer
    else the nationkey-0 'Unknown' bucket)."""
    rich = t.customer.filter(F.col("c_acctbal") > 9000)
    o = t.orders
    joined = o.join(rich, o.o_custkey == rich.c_custkey, "left")
    n = t.nation
    return (
        joined.join(
            F.broadcast(n), n.n_nationkey == F.coalesce(rich.c_nationkey, F.lit(0))
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "p22_semi_join_exists",
    """
    SELECT p.p_partkey, p.p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
    """,
    tags=("join",),
)
def p22_semi_join_exists(t):
    """Semi-join / EXISTS (`SQLQueryiesPractice.sql:177-182`) →
    left_semi: no row multiplication, fact side never materializes."""
    hot = t.lineitem.filter(F.col("l_quantity") >= 49)
    return t.part.join(
        hot, t.part.p_partkey == hot.l_partkey, "left_semi"
    ).select("p_partkey", "p_name")


@query(
    "p23_anti_join_not_exists",
    """
    SELECT p.p_partkey, p.p_name FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
    """,
    tags=("join",),
)
def p23_anti_join_not_exists(t):
    """Anti-join / NOT EXISTS (`StarSchemaForHealthcare.sql:177-180`
    dedup-on-load; `ReferenceData.sql:214-217` FK validation)."""
    hot = t.lineitem.filter(F.col("l_quantity") >= 49)
    return t.part.join(
        hot, t.part.p_partkey == hot.l_partkey, "left_anti"
    ).select("p_partkey", "p_name")


@query(
    "p24_five_table_join",
    """
    SELECT r.r_name, p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY r.r_name, p.p_brand
    """,
    tags=("join", "agg"),
)
def p24_five_table_join(t):
    """5-table mixed join (`ProviderNetwork.sql:254-270` claim CPTs →
    contract rates). part/supplier/nation/region all broadcast; lineitem
    is the only shuffled side."""
    li = t.lineitem
    p = t.part.filter(F.col("p_type") == "ECONOMY")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(t.supplier), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "p_brand")
        .agg(F.sum(money("l_extendedprice")).cast("double").alias("total_price"))
    )


@query(
    "p25_update_with_join",
    """
    SELECT o.o_orderkey,
           CASE WHEN t.line_total > 300000 THEN 1 ELSE 0 END AS high_bill_flag
    FROM orders o
    LEFT JOIN (SELECT l_orderkey,
                      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS line_total
               FROM lineitem GROUP BY l_orderkey) t
      ON o.o_orderkey = t.l_orderkey
    """,
    tags=("join", "agg"),
)
def p25_update_with_join(t):
    """UPDATE-with-JOIN via derived agg (`SQLQueryiesPractice.sql:147-159`
    flag claims >$1000): immutable rebuild — aggregate detail, join back,
    derive the flag column (SURVEY §7 hard-part 4)."""
    totals = t.lineitem.groupBy("l_orderkey").agg(
        F.sum(money("l_extendedprice")).cast("double").alias("line_total")
    )
    o = t.orders
    return o.join(totals, o.o_orderkey == totals.l_orderkey, "left").select(
        "o_orderkey",
        F.when(F.col("line_total") > 300000, 1).otherwise(0).alias("high_bill_flag"),
    )


@query(
    "p26_delete_with_join",
    """
    SELECT COUNT(*) AS n_remaining,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS remaining_value
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
    """,
    tags=("join",),
)
def p26_delete_with_join(t):
    """DELETE-with-JOIN (`SQLQueryiesPractice.sql:167-174` drop lines of
    denied claims) as anti-join filter — the retained set, immutably."""
    denied = t.orders.filter(F.col("o_orderstatus") == "F")
    kept = t.lineitem.join(
        denied, t.lineitem.l_orderkey == denied.o_orderkey, "left_anti"
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_remaining"),
        F.sum(money("l_extendedprice")).cast("double").alias("remaining_value"),
    )


# ---------------------------------------------------------------- §2.4
# Aggregations


@query("p27_count_star", "SELECT COUNT(*) AS n FROM lineitem", tags=("agg",))
def p27_count_star(t):
    """Scalar COUNT(*) (`Members&EligibilitySource.sql:261-262`)."""
    return t.lineitem.agg(F.count(F.lit(1)).alias("n"))


@query(
    "p28_multi_agg_scalar",
    """
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(o_totalprice) AS DOUBLE) AS avg_price,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    """,
    tags=("agg",),
)
def p28_multi_agg_scalar(t):
    """COUNT/SUM/AVG/MIN/MAX with no grouping
    (`SQLQueryiesPractice.sql:70-76`)."""
    o = t.orders
    tp = money("o_totalprice")
    return o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(tp).cast("double").alias("total"),
        (F.sum(tp).cast("double") / F.count(tp).cast("double")).alias("avg_price"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )


@query(
    "p29_groupby_orderby",
    "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY n DESC",
    tags=("agg",),
)
def p29_groupby_orderby(t):
    """GROUP BY + ORDER BY count (`SQLQueryiesPractice.sql:79-82`)."""
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
    )


@query(
    "p30_having",
    """
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 15
    """,
    tags=("agg",),
)
def p30_having(t):
    """HAVING (`SQLQueryiesPractice.sql:85-88`) = post-agg filter."""
    return (
        t.orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 15)
    )


@query(
    "p31_sum_null_default",
    """
    SELECT o.o_orderstatus,
           CAST(SUM(COALESCE(CAST(l.l_extendedprice AS DECIMAL(12,2)), 0)) AS DOUBLE) AS hot_value
    FROM orders o
    LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 45) l
      ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("agg", "nulls"),
)
def p31_sum_null_default(t):
    """SUM(ISNULL(x,0)) over outer-joined detail
    (`Claims & Encounters.sql:381-392` billed vs allowed vs paid)."""
    hot = t.lineitem.filter(F.col("l_quantity") >= 45)
    o = t.orders
    return (
        o.join(hot, o.o_orderkey == hot.l_orderkey, "left")
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.coalesce(money("l_extendedprice"), F.lit(0).cast(D12)))
            .cast("double")
            .alias("hot_value")
        )
    )


@query(
    "p32_conditional_agg",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           COUNT(*) AS n_total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def p32_conditional_agg(t):
    """Conditional aggregation SUM(CASE WHEN…)
    (`CareManagementCCA.sql:318-325` tasks done per user)."""
    o = t.orders
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(o.o_orderstatus == "F", 1).otherwise(0)).alias("n_finished"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "p33_flag_agg_max_case",
    """
    SELECT o_custkey,
           CAST(MAX(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS INT) AS has_big_order,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
    tags=("agg",),
)
def p33_flag_agg_max_case(t):
    """Flag aggregation MAX(CASE WHEN…) (`CareManagementCCA.sql:338-349`
    A1c gap closed per member)."""
    o = t.orders
    return o.groupBy("o_custkey").agg(
        F.max(F.when(o.o_totalprice > 400000, 1).otherwise(0)).alias("has_big_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "p34_rowcount_dashboard",
    """
    SELECT 'customer' AS table_name, COUNT(*) AS n FROM customer
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'region', COUNT(*) FROM region
    """,
    tags=("agg", "setop"),
)
def p34_rowcount_dashboard(t):
    """Row-count dashboard via UNION ALL of per-table counts
    (`StarSchemaForHealthcare.sql:394-405`)."""
    parts = [
        t[name].agg(
            F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n")
        )
        for name in ("customer", "orders", "lineitem", "part", "supplier", "nation", "region")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# ---------------------------------------------------------------- §2.6
# Sorts / limits / top-k


@query(
    "p42_orderby_multikey",
    """
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    ORDER BY o_orderdate DESC, o_totalprice ASC, o_orderkey LIMIT 20
    """,
    tags=("sort",),
)
def p42_orderby_multikey(t):
    """ORDER BY multi-key ASC/DESC (`SQLQueryiesPractice.sql:16-18`)
    with unique tie-break for determinism (SURVEY §7 hard-part 6)."""
    return (
        t.orders.orderBy(
            F.desc("o_orderdate"), F.asc("o_totalprice"), F.asc("o_orderkey")
        )
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .limit(20)
    )


@query(
    "p43_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
    """,
    tags=("sort", "topk"),
)
def p43_topk(t):
    """TOP (5) ORDER BY (`SQLQueryiesPractice.sql:59-61`) — Spark plans
    TakeOrderedAndProject: per-partition heap, no global sort."""
    return (
        t.orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(5)
    )


@query(
    "p44_offset_fetch",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 3 OFFSET 1
    """,
    tags=("sort", "topk"),
)
def p44_offset_fetch(t):
    """OFFSET 1 FETCH NEXT 3 (`SQLQueryiesPractice.sql:64-67`) via
    Spark ≥3.4 offset()+limit()."""
    return (
        t.orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(1)
        .limit(3)
    )


# ---------------------------------------------------------------- §2.7
# Set operations


@query(
    "p45_union_dedup",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def p45_union_dedup(t):
    """UNION with dedup (`SQLQueryiesPractice.sql:186-188`; date-domain
    build `StarSchemaForHealthcare.sql:143-164`)."""
    c = t.customer.select(F.col("c_nationkey").alias("nationkey"))
    s = t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "p46_union_all",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer WHERE c_nationkey < 3
    UNION ALL
    SELECT s_nationkey, 'supplier' FROM supplier WHERE s_nationkey < 3
    """,
    tags=("setop",),
)
def p46_union_all(t):
    """UNION ALL (`SQLQueryiesPractice.sql:191-193`)."""
    c = t.customer.filter(F.col("c_nationkey") < 3).select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    s = t.supplier.filter(F.col("s_nationkey") < 3).select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return c.union(s)


@query(
    "p47_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def p47_intersect(t):
    """INTERSECT (`SQLQueryiesPractice.sql:196-198`)."""
    c = t.customer.select(F.col("c_nationkey").alias("nationkey"))
    s = t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "p48_except",
    """
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def p48_except(t):
    """EXCEPT (`SQLQueryiesPractice.sql:201-203`) → subtract
    (distinct semantics, matching T-SQL EXCEPT)."""
    n = t.nation.select(F.col("n_nationkey").alias("nationkey"))
    s = t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return n.subtract(s)


# ---------------------------------------------------------------- §2.8
# Scalar functions


@query(
    "p49_date_parts",
    """
    SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
    tags=("dates", "agg"),
)
def p49_date_parts(t):
    """YEAR/MONTH/DAY extraction (`StarSchemaForHealthcare.sql:167-169`)."""
    return (
        t.orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        ).agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "p50_datediff",
    """
    SELECT o.o_orderpriority,
           CAST(SUM(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT) AS total_delay_days,
           COUNT(*) AS n
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("dates", "agg"),
)
def p50_datediff(t):
    """DATEDIFF(day, a, b) — length-of-stay derivation
    (`Claims & Encounters.sql:397`, `StarSchemaForHealthcare.sql:348-349`).
    NOTE Spark's datediff(end, start) flips T-SQL's argument order
    (SURVEY §7 hard-part 3)."""
    o = t.orders
    li = t.lineitem
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.datediff(li.l_shipdate, o.o_orderdate)).alias("total_delay_days"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "p51_date_sk",
    """
    SELECT DISTINCT o_orderdate AS d,
           year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS date_sk
    FROM orders
    """,
    tags=("dates",),
)
def p51_date_sk(t):
    """Smart DateSK = yyyy*10000+mm*100+dd
    (`StarSchemaForHealthcare.sql:167`)."""
    return (
        t.orders.select(F.col("o_orderdate").alias("d"))
        .distinct()
        .select(
            "d",
            (F.year("d") * 10000 + F.month("d") * 100 + F.dayofmonth("d")).alias(
                "date_sk"
            ),
        )
    )


@query(
    "p52_isnull_coalesce",
    """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved
    FROM orders WHERE o_orderkey <= 1000
    """,
    tags=("nulls",),
)
def p52_isnull_coalesce(t):
    """ISNULL/COALESCE fallback chain (`StarSchemaForHealthcare.
    sql:306-312`; `Claims & Encounters.sql:383-384`)."""
    o = t.orders.filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(o.o_orderstatus, F.lit("P")), F.lit("PENDING")).alias(
            "status_resolved"
        ),
    )


@query(
    "p53_string_funcs",
    """
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           substring(c_name, 10, 9) AS cust_num,
           concat(c_name, ':', c_mktsegment) AS name_seg,
           length(c_name) AS name_len
    FROM customer WHERE c_custkey < 100
    """,
    tags=("strings",),
)
def p53_string_funcs(t):
    """String function surface (upper/lower/substring/concat/length) —
    extension beyond the reference's LIKE-only usage (SURVEY §2.8)."""
    c = t.customer.filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
        F.length("c_name").alias("name_len"),
    )


# ---------------------------------------------------------------- §2.9
# Views, CTEs, SQL surface


@query(
    "p54_view_query",
    """
    SELECT c_name, o_orderkey, o_totalprice, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_totalprice > 430000
    """,
    tags=("view", "sql"),
)
def p54_view_query(t):
    """CREATE VIEW + query-the-view (`SQLQueryiesPractice.sql:206-222`):
    a named 3-table join registered as a temp view, then filtered via
    the SQL surface (EP3)."""
    spark = t.customer.sparkSession
    joined = (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_name", "o_orderkey", "o_totalprice", "n_name")
    )
    joined.createOrReplaceTempView("vw_customer_orders")
    return spark.sql("SELECT * FROM vw_customer_orders WHERE o_totalprice > 430000")


@query(
    "p55_cte",
    """
    WITH revenue AS (
      SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                                 * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_rev
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev > (SELECT CAST(SUM(total_rev) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) FROM revenue)
    """,
    tags=("view", "sql"),
)
def p55_cte(t):
    """CTE + scalar subquery (`StarSchemaForHealthcare.sql:143-164`
    WITH alldates): suppliers with above-average revenue, via the full
    Spark SQL surface over temp views."""
    spark = t.lineitem.sparkSession
    t.lineitem.createOrReplaceTempView("p55_lineitem")
    t.supplier.createOrReplaceTempView("p55_supplier")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                                     * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_rev
          FROM p55_lineitem GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM p55_supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev > (SELECT CAST(SUM(total_rev) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) FROM revenue)
        """
    )


# ---------------------------------------------------------------- skew


@query(
    "p56_salted_join",
    """
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'AUTOMOBILE'
    GROUP BY o_orderpriority
    """,
    tags=("join", "skew"),
)
def p56_salted_join(t):
    """Salted equi-join: the large side fans out across 8 synthetic
    sub-keys, the small side replicates 8x — the explicit skew
    mitigation for a hot broadcast-ineligible key (operators/skew.py).
    The oracle is the PLAIN join: salting must be row-identical."""
    from data_engineer_project_spark.operators.skew import salted_join

    cust = t.customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("o_custkey")
    )
    joined = salted_join(t.orders, cust, on="o_custkey", salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@query(
    "p57_salted_agg",
    """
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "skew"),
)
def p57_salted_agg(t):
    """Two-phase salted aggregation for hot group keys (5 priorities
    over all orders — maximal key skew): partial agg on (key, salt),
    merge on key. Decimal partials make the merge order-independent,
    so the result equals the direct aggregation the oracle runs."""
    from data_engineer_project_spark.operators.skew import salted_agg

    return salted_agg(
        t.orders,
        ["o_orderpriority"],
        [
            (F.count(F.lit(1)), F.sum, "n"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                lambda c: F.sum(c).cast("double"),
                "total",
            ),
        ],
        salts=16,
    )


# ------------------------------------------------- multi-dim aggregation


@query(
    "p58_rollup",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    tags=("agg", "multidim"),
)
def p58_rollup(t):
    """ROLLUP hierarchy totals (priority → priority+status → grand
    total) — SURVEY §2.4's 'free in Spark' extension of the reference's
    GROUP BY surface. One pass, Expand operator, no self-unions."""
    return t.orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@query(
    "p59_cube",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    tags=("agg", "multidim"),
)
def p59_cube(t):
    """CUBE: all 2^k grouping combinations in one Expand pass."""
    return t.orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "p60_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
    tags=("agg", "multidim"),
)
def p60_grouping_sets(t):
    """Explicit GROUPING SETS (two independent one-dim rollups in one
    scan) via the SQL surface over a temp view."""
    spark = t.orders.sparkSession
    t.orders.createOrReplaceTempView("p60_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM p60_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


@query(
    "p61_merge_upsert",
    """
    WITH updates AS (
      SELECT n_nationkey, upper(n_name) AS n_name, n_regionkey
      FROM nation WHERE n_nationkey < 10
      UNION ALL
      SELECT 99, 'atlantis', 0
    )
    SELECT n_nationkey, n_name, n_regionkey FROM updates
    UNION ALL
    SELECT t.n_nationkey, t.n_name, t.n_regionkey FROM nation t
    LEFT JOIN updates u ON t.n_nationkey = u.n_nationkey
    WHERE u.n_nationkey IS NULL
    """,
    tags=("etl", "merge"),
)
def p61_merge_upsert(t):
    """MERGE/upsert semantics without a mutable store (SURVEY §7
    hard-part 4): updates win via anti-join + union — matched rows
    replaced, unmatched inserted, others untouched. The immutable
    rebuild equivalent of Delta MERGE, and of the reference's
    NOT EXISTS upsert guards (`StarSchemaForHealthcare.sql:177-180`)."""
    nation = t.nation
    updates = (
        nation.filter(F.col("n_nationkey") < 10)
        .select(
            "n_nationkey", F.upper("n_name").alias("n_name"), "n_regionkey"
        )
        .union(
            nation.sparkSession.createDataFrame(
                [(99, "atlantis", 0)], "n_nationkey INT, n_name STRING, n_regionkey INT"
            )
        )
    )
    untouched = nation.join(updates, "n_nationkey", "left_anti").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return updates.select("n_nationkey", "n_name", "n_regionkey").union(untouched)


# ------------------------------------------------- §2.4 extensions:
# reshaping (PIVOT/UNPIVOT) and exact order statistics — operators the
# reference's T-SQL dialect has (PIVOT, PERCENTILE_CONT) but its
# scripts never exercise; first-class in the engine.


@query(
    "p62_pivot",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "pivot"),
)
def p62_pivot(t):
    """PIVOT: order counts by priority, statuses fanned out to columns.
    `groupBy().pivot(col, values)` with the value list given explicitly
    — that keeps the plan a single-pass partial aggregate (no extra
    distinct-values job, which at 100 TB would be a full scan before
    the real one). Semantically = conditional aggregation (the oracle
    form; SURVEY §2.4 `CareManagementCCA.sql:318-325`)."""
    piv = (
        t.orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@query(
    "p63_unpivot",
    """
    SELECT measure,
           CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM (
      SELECT 'quantity' AS measure, l_quantity AS v FROM lineitem
      UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
    ) m
    GROUP BY measure
    """,
    tags=("agg", "unpivot"),
)
def p63_unpivot(t):
    """UNPIVOT/melt: three measure columns become (measure, value)
    rows via `DataFrame.unpivot` — Spark plans an Expand node (one scan
    emitting 3 rows per input) rather than the 3-scan UNION ALL the
    oracle spells out; same result, a third of the I/O."""
    u = t.lineitem.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "v",
    ).withColumn("measure", F.regexp_replace("measure", "^l_", ""))
    return u.groupBy("measure").agg(
        F.sum(money("v")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "p64_percentiles",
    """
    SELECT l_returnflag,
           CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS q25,
           CAST(quantile_cont(l_quantity, 0.5)  AS DOUBLE) AS median_qty,
           CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def p64_percentiles(t):
    """Exact order statistics per group: PERCENTILE_CONT ≙ Spark's
    `percentile()` (exact linear interpolation, same formula DuckDB's
    quantile_cont uses; quarter fractions are binary-exact so the
    doubles hash-match). Exact percentile is a sort-based aggregate —
    fine per-group; at 100 TB unbounded-group use approx_percentile
    (t-digest, mergeable map-side) instead, benchmarked in d17."""
    li = t.lineitem
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
    )


@query(
    "p65_ntile_quartiles",
    """
    WITH b AS (
      SELECT c_acctbal,
             NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    )
    SELECT quartile, COUNT(*) AS n,
           CAST(MIN(c_acctbal) AS DOUBLE) AS lo,
           CAST(MAX(c_acctbal) AS DOUBLE) AS hi
    FROM b GROUP BY quartile
    """,
    tags=("window", "ntile"),
)
def p65_ntile_quartiles(t):
    """Equal-frequency bucketing via NTILE over a global order (unique
    tiebreaker key → deterministic). A global window single-partitions
    the sort, which is fine for dim-sized inputs; for fact-scale
    bucketing the scale path is approx_percentile cutoffs + a range
    join, not a global NTILE (see d17/p64)."""
    c = t.customer
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.select("c_acctbal", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").cast("double").alias("lo"),
            F.max("c_acctbal").cast("double").alias("hi"),
        )
    )


@query(
    "p66_explode_lateral",
    """
    SELECT wd, COUNT(*) AS n, COUNT(DISTINCT p_partkey) AS n_parts
    FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS wd FROM part) u
    GROUP BY wd
    """,
    tags=("lateral", "explode", "agg"),
)
def p66_explode_lateral(t):
    """Array explode / LATERAL unnest: one row per word of each part
    name, aggregated to a vocabulary. Generate (explode) is a narrow
    op — the only shuffle is the final groupBy on the word."""
    p = t.part
    return (
        p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("wd"))
        .groupBy("wd")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
    )


@query(
    "p67_intersect_all",
    """
    SELECT l_partkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-04-01' AND l_shipdate < TIMESTAMP '1996-07-01'
    """,
    tags=("setop",),
)
def p67_intersect_all(t):
    """INTERSECT ALL — multiset intersection (duplicates preserved to
    the min multiplicity), the bag-semantics sibling of p47. Plans as
    one shuffle on the key with per-side counts, no explosion."""
    li = t.lineitem
    q1 = li.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    ).select("l_partkey")
    q2 = li.filter(
        (F.col("l_shipdate") >= "1996-04-01") & (F.col("l_shipdate") < "1996-07-01")
    ).select("l_partkey")
    return q1.intersectAll(q2)


@query(
    "p68_except_all",
    """
    SELECT l_partkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    EXCEPT ALL
    SELECT l_partkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-04-01' AND l_shipdate < TIMESTAMP '1996-07-01'
    """,
    tags=("setop",),
)
def p68_except_all(t):
    """EXCEPT ALL — multiset difference (each Q2 occurrence cancels one
    Q1 occurrence), completing the set-op family (p45/p46/p47/p48)."""
    li = t.lineitem
    q1 = li.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    ).select("l_partkey")
    q2 = li.filter(
        (F.col("l_shipdate") >= "1996-04-01") & (F.col("l_shipdate") < "1996-07-01")
    ).select("l_partkey")
    return q1.exceptAll(q2)


@query(
    "p69_percent_of_total",
    """
    WITH rev AS (
      SELECT n_name,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS nation_rev
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY n_name
    )
    SELECT n_name,
           CAST(nation_rev AS DOUBLE) AS revenue,
           CAST(100.0 * CAST(nation_rev AS DOUBLE)
                / CAST(SUM(nation_rev) OVER () AS DOUBLE) AS DOUBLE) AS pct_of_total
    FROM rev
    """,
    tags=("window", "ratio"),
)
def p69_percent_of_total(t):
    """Ratio-to-report: each nation's share of total revenue via an
    unpartitioned window sum OVER the aggregated rows. The global
    window runs on the 25-row aggregate, not the fact table — the
    grand total only ever sees post-aggregation data, which is the
    form that stays cheap at any fact size."""
    rev = (
        t.orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("nation_rev"))
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        F.col("nation_rev").cast("double").alias("revenue"),
        (
            F.lit(100.0) * F.col("nation_rev").cast("double")
            / F.sum("nation_rev").over(w).cast("double")
        ).alias("pct_of_total"),
    )


_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


@query(
    "p70_column_profile",
    "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_val,
               CAST(MAX({c}) AS VARCHAR) AS max_val
        FROM orders"""
        for c in _PROFILE_COLS
    ),
    tags=("quality", "profile"),
)
def p70_column_profile(t):
    """Column profiling — the data-quality survey step (the engine
    form of the reference's validation SELECTs,
    `StarSchemaForHealthcare.sql:394-422`): per column, row/null/
    distinct counts and min/max, computed in ONE pass over the table
    (a single multi-aggregate; the oracle spells it as N scans).
    min/max are computed on the native type, then stringified."""
    o = t.orders
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    per_col = [
        wide.select(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__dist").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        for c in _PROFILE_COLS
    ]
    out = per_col[0]
    for df in per_col[1:]:
        out = out.unionByName(df)
    return out


@query(
    "p71_view_lifecycle_audit",
    """
    SELECT * FROM (VALUES
      (1, 'create_if_absent', TRUE,  CAST(5 AS BIGINT)),
      (2, 'guard_noop',       TRUE,  CAST(5 AS BIGINT)),
      (3, 'alter_replace',    TRUE,  CAST(5 AS BIGINT)),
      (4, 'rename_new',       TRUE,  CAST(5 AS BIGINT)),
      (5, 'rename_old_gone',  FALSE, CAST(0 AS BIGINT)),
      (6, 'drop',             FALSE, CAST(0 AS BIGINT))
    ) AS t(step, action, view_exists, n_rows)
    ORDER BY step
    """,
    tags=("catalog", "ddl"),
)
def p71_view_lifecycle_audit(t):
    """The view-lifecycle DDL surface as a GATEABLE audit trail —
    CREATE-if-absent guard (the reference's ``IF DB_ID()`` /
    ``IF NOT EXISTS`` idiom, `SQLQueryiesPractice.sql:147`), ALTER
    VIEW ≙ CREATE OR REPLACE (`SQLQueryiesPractice.sql:225-238`),
    sp_rename ≙ drop+recreate (`SQLQueryiesPractice.sql:242-244`),
    DROP. Each step performs the REAL catalog operation and records
    the observed state (exists? row count through the view); the
    oracle pins the expected transition table, so any engine whose
    catalog semantics drift (guard not idempotent, replace losing
    rows, rename leaving the old name) turns the row red. DDL is
    imperative by nature — the audit rows are the query's honest
    DataFrame form (temp views are session-scoped: no on-disk state,
    re-entrant via createOrReplace + final drop)."""
    spark = t.region.sparkSession
    v1, v2 = "p71_vw_region", "p71_vw_region_renamed"
    for name in (v1, v2):  # re-entrancy: heal any crashed prior run
        spark.catalog.dropTempView(name)

    def obs(step, action, name):
        exists = spark.catalog.tableExists(name)
        n = spark.table(name).count() if exists else 0
        return (step, action, exists, n)

    rows = []
    # 1: guarded create (absent → created)
    if not spark.catalog.tableExists(v1):
        t.region.createOrReplaceTempView(v1)
    rows.append(obs(1, "create_if_absent", v1))
    # 2: guard again with a DIFFERENT body — must be a no-op
    if not spark.catalog.tableExists(v1):
        t.region.limit(2).createOrReplaceTempView(v1)
    rows.append(obs(2, "guard_noop", v1))
    # 3: ALTER VIEW == CREATE OR REPLACE (projection change, same rows)
    t.region.selectExpr(
        "r_regionkey", "upper(r_name) AS r_name"
    ).createOrReplaceTempView(v1)
    rows.append(obs(3, "alter_replace", v1))
    # 4/5: rename == create new + drop old
    spark.table(v1).createOrReplaceTempView(v2)
    spark.catalog.dropTempView(v1)
    rows.append(obs(4, "rename_new", v2))
    rows.append(obs(5, "rename_old_gone", v1))
    # 6: drop
    spark.catalog.dropTempView(v2)
    rows.append(obs(6, "drop", v2))
    return spark.createDataFrame(
        rows, "step int, action string, view_exists boolean, n_rows bigint"
    ).orderBy("step")


@query(
    "p72_calendar_gap_fill",
    """
    WITH span AS (
      SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
             date_trunc('month', MAX(o_orderdate)) AS hi
      FROM orders
    ),
    months AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE)
               AS month
      FROM span
    ),
    grid AS (
      SELECT m.month, n.n_nationkey, n.n_name FROM months m CROSS JOIN nation n
    ),
    monthly AS (
      SELECT c.c_nationkey AS nk,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT g.n_name, g.month,
           COALESCE(m.n_orders, 0) AS n_orders,
           COALESCE(m.revenue, 0.0) AS revenue
    FROM grid g LEFT JOIN monthly m
      ON g.n_nationkey = m.nk AND g.month = m.month
    """,
    tags=("calendar", "gapfill", "join"),
)
def p72_calendar_gap_fill(t):
    """Calendar-dimension gap fill: a generated month spine (SEQUENCE
    from the data's own min/max month — the engine form of a calendar
    dim table) crossed with the nation dim, left-joined to per-nation
    monthly order rollups so EMPTY nation-months surface as explicit
    zero rows — the reporting contract dashboards need (a missing row
    reads as 'no data', a zero row as 'no orders').

    Scale shape: the spine is driver-thin (decades = hundreds of
    rows) and the nation dim is small, so the grid is a broadcast on
    both sides; the only real work is the orders⋈customer rollup —
    one shuffle each, map-side-combined. The left join of a tiny grid
    against a tiny rollup is broadcast too; nothing here grows with
    fact size except the rollup scan. Revenue folds in DECIMAL(18,2)
    then casts to DOUBLE — order-free, bit-exact cross-engine."""
    o, c, n = t.orders, t.customer, t.nation
    span = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hi"),
    )
    months = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval '1' month"))
        ).alias("month")
    )
    grid = months.crossJoin(
        F.broadcast(n.select("n_nationkey", "n_name"))
    ).withColumnRenamed("month", "g_month")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("m_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("revenue"),
        )
    )
    return grid.join(
        monthly,
        (grid.n_nationkey == monthly.nk) & (grid.g_month == monthly.m_month),
        "left",
    ).select(
        "n_name",
        F.col("g_month").alias("month"),
        F.coalesce("n_orders", F.lit(0).cast("long")).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )


@query(
    "p73_recursive_hierarchy",
    """
    WITH RECURSIVE sup AS (
      SELECT s_suppkey, CAST(s_suppkey // 5 AS BIGINT) AS parent,
             CAST(s_acctbal AS DECIMAL(18,2)) AS bal
      FROM supplier
    ),
    walk(root, node, depth) AS (
      SELECT s_suppkey, s_suppkey, 0 FROM sup WHERE s_suppkey < 5
      UNION ALL
      SELECT w.root, s.s_suppkey, w.depth + 1
      FROM walk w JOIN sup s ON s.parent = w.node AND s.s_suppkey >= 5
    )
    SELECT w.root,
           CAST(COUNT(*) AS BIGINT) AS n_reachable,
           CAST(MAX(w.depth) AS INT) AS max_depth,
           CAST(SUM(s.bal) AS DOUBLE) AS subtree_balance
    FROM walk w JOIN sup s ON s.s_suppkey = w.node
    GROUP BY w.root
    """,
    tags=("recursive", "hierarchy"),
)
def p73_recursive_hierarchy(t):
    """Recursive-CTE hierarchy rollup — the T-SQL org-chart /
    bill-of-materials idiom, run NATIVELY with Spark's WITH RECURSIVE
    (4.x): a synthetic 5-ary reports-to tree over suppliers
    (parent = suppkey div 5, roots below 5) walked to transitive
    closure, then per-root subtree size / depth / exact DECIMAL
    balance rollup. DuckDB executes the IDENTICAL statement, so the
    oracle pins the whole recursion, not a rewrite.

    Scale shape: each recursion step is one equi-join of the frontier
    against the child table plus a distinct — exactly the iteration
    operators/graph.py hand-builds for component labeling; the engine
    unrolls O(depth) joins (tree depth here is log₅ N). At 100 TB the
    same statement runs with the child side bucketed on ``parent`` so
    every step's join is co-partitioned."""
    spark = t.supplier.sparkSession
    t.supplier.createOrReplaceTempView("p73_supplier")
    return spark.sql(
        """
        WITH RECURSIVE sup AS (
          SELECT s_suppkey, CAST(s_suppkey DIV 5 AS BIGINT) AS parent,
                 CAST(s_acctbal AS DECIMAL(18,2)) AS bal
          FROM p73_supplier
        ),
        walk(root, node, depth) AS (
          SELECT s_suppkey, s_suppkey, 0 FROM sup WHERE s_suppkey < 5
          UNION ALL
          SELECT w.root, s.s_suppkey, w.depth + 1
          FROM walk w JOIN sup s ON s.parent = w.node
                                AND s.s_suppkey >= 5
        )
        SELECT w.root,
               CAST(COUNT(*) AS BIGINT) AS n_reachable,
               CAST(MAX(w.depth) AS INT) AS max_depth,
               CAST(SUM(s.bal) AS DOUBLE) AS subtree_balance
        FROM walk w JOIN sup s ON s.s_suppkey = w.node
        GROUP BY w.root
        """
    )


@query(
    "p74_catalog_bootstrap_audit",
    """
    SELECT * FROM (VALUES
      ( 1, 'create_db_if_absent',    TRUE,  CAST(1 AS BIGINT)),
      ( 2, 'create_db_guard_noop',   TRUE,  CAST(1 AS BIGINT)),
      ( 3, 'create_schema_if_absent',TRUE,  CAST(1 AS BIGINT)),
      ( 4, 'create_table_declared',  TRUE,  CAST(4 AS BIGINT)),
      ( 5, 'insert_values_seed',     TRUE,  CAST(3 AS BIGINT)),
      ( 6, 'create_table_guard_noop',TRUE,  CAST(4 AS BIGINT)),
      ( 7, 'check_pk_unique',        TRUE,  CAST(0 AS BIGINT)),
      ( 8, 'check_not_null',         TRUE,  CAST(0 AS BIGINT)),
      ( 9, 'check_default_applied',  TRUE,  CAST(2 AS BIGINT)),
      (10, 'check_fk_region',        TRUE,  CAST(0 AS BIGINT)),
      (11, 'drop_db_cascade',        FALSE, CAST(0 AS BIGINT))
    ) AS t(step, action, ok, observed)
    ORDER BY step
    """,
    tags=("catalog", "ddl", "quality"),
)
def p74_catalog_bootstrap_audit(t):
    """The reference's database/schema/table bootstrap as a GATEABLE
    audit trail — the last §2.1 rows that were pytest-only. Performs
    the REAL catalog lifecycle: guarded CREATE DATABASE (``IF DB_ID()
    IS NULL``, `Members&EligibilitySource.sql:1-6`), guarded CREATE
    SCHEMA (`Members&EligibilitySource.sql:8-9`), CREATE TABLE with
    the constraint regime of `Claims & Encounters.sql:15-27` (NOT
    NULL + DEFAULT 'Submitted' enforced natively by Spark's column
    DEFAULT; PK/UNIQUE/FK as the data-quality checks Spark maps them
    to, `plans/quality.py`), INSERT...VALUES seeding (partial column
    list exercising the DEFAULT), idempotent re-CREATE guards, and
    DROP ... CASCADE. Each step records observed catalog state; the
    oracle pins the expected transition table, so drifted guard
    semantics, a lost DEFAULT, or constraint-check regressions turn
    the row red.

    The scratch database lives in a mkdtemp warehouse (never the
    caller's cwd), is healed at entry and dropped at exit, so the
    query is re-entrant and leaves no state behind."""
    import tempfile

    from data_engineer_project_spark.plans.quality import (
        duplicate_keys,
        fk_violations,
    )

    spark = t.region.sparkSession
    db, schema_db = "p74_cca", "p74_cca_s2_claims"
    for d in (db, schema_db):  # heal any crashed prior run
        spark.sql(f"DROP DATABASE IF EXISTS {d} CASCADE")
    wh = tempfile.mkdtemp(prefix="p74_wh_")
    rows = []

    def create_db(name):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{wh}/{name}'")
        return spark.catalog.databaseExists(name)

    try:
        # 1/2: guarded CREATE DATABASE, then the guard again (no-op)
        rows.append((1, "create_db_if_absent", create_db(db), int(create_db(db))))
        rows.append((2, "create_db_guard_noop", create_db(db), int(create_db(db))))
        # 3: CREATE SCHEMA ≙ Spark database-as-namespace
        rows.append(
            (3, "create_schema_if_absent", create_db(schema_db), int(create_db(schema_db)))
        )
        tbl = f"{schema_db}.claim_header"
        ddl = f"""CREATE TABLE IF NOT EXISTS {tbl} (
            claim_id INT NOT NULL,
            claim_number STRING NOT NULL,
            region_key INT,
            claim_status STRING DEFAULT 'Submitted'
        ) USING parquet"""
        # 4: declared schema + native NOT NULL / DEFAULT
        spark.sql(ddl)
        rows.append(
            (4, "create_table_declared", spark.catalog.tableExists(tbl),
             len(spark.table(tbl).columns))
        )
        # 5: INSERT...VALUES — partial column list rides the DEFAULT
        spark.sql(
            f"INSERT INTO {tbl} (claim_id, claim_number, region_key) "
            "VALUES (1, 'C-1001', 0), (2, 'C-1002', 1)"
        )
        spark.sql(f"INSERT INTO {tbl} VALUES (3, 'C-1003', 2, 'Paid')")
        rows.append((5, "insert_values_seed", True, spark.table(tbl).count()))
        # 6: CREATE guard again with a DIFFERENT body — must be a no-op
        spark.sql(ddl.replace("region_key INT,", ""))
        rows.append(
            (6, "create_table_guard_noop", spark.catalog.tableExists(tbl),
             len(spark.table(tbl).columns))
        )
        # 7-10: the constraint regime as distributed quality checks
        claims = spark.table(tbl)
        n_dup = duplicate_keys(claims, ["claim_id"]).count()
        rows.append((7, "check_pk_unique", n_dup == 0, n_dup))
        n_null = claims.filter(F.col("claim_number").isNull()).count()
        rows.append((8, "check_not_null", n_null == 0, n_null))
        n_def = claims.filter(F.col("claim_status") == "Submitted").count()
        rows.append((9, "check_default_applied", n_def == 2, n_def))
        n_fk = fk_violations(
            claims,
            t.region.select(F.col("r_regionkey").alias("region_key")),
            on="region_key",
        ).count()
        rows.append((10, "check_fk_region", n_fk == 0, n_fk))
    finally:
        import shutil

        for d in (schema_db, db):
            spark.sql(f"DROP DATABASE IF EXISTS {d} CASCADE")
        shutil.rmtree(wh, ignore_errors=True)  # leave no scratch behind
    rows.append(
        (11, "drop_db_cascade", spark.catalog.databaseExists(schema_db), 0)
    )
    return spark.createDataFrame(
        rows, "step int, action string, ok boolean, observed bigint"
    ).orderBy("step")


# ---------------------------------------------------------------- §2.1
# Transaction test-mode (BEGIN TRAN ... ROLLBACK), Spark-idiomatically


@query(
    "p75_tran_rollback_audit",
    """
    WITH base AS (
      SELECT COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_value
      FROM lineitem
    ),
    cand AS (
      SELECT COUNT(*) AS n_lines,
             CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 0)
                  AS DOUBLE) AS total_value
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey
                          AND o.o_orderstatus = 'F')
    )
    SELECT 'base' AS phase, CAST(n_lines AS BIGINT) AS n_lines,
           total_value FROM base
    UNION ALL SELECT 'candidate_commit', CAST(n_lines AS BIGINT),
           total_value FROM cand
    UNION ALL SELECT 'after_rollback', CAST(n_lines AS BIGINT),
           total_value FROM base
    ORDER BY phase
    """,
    tags=("dml", "governance"),
)
def p75_tran_rollback_audit(t):
    """The reference's one transactional block — `BEGIN TRAN; DELETE
    cl ... JOIN ... WHERE ClaimStatus='Denied'; -- ROLLBACK`
    (`SQLQueryiesPractice.sql:167-174`, test-mode delete) — expressed
    in Spark's execution model, where mutation-in-place does not
    exist and the equivalent contract is SNAPSHOT DERIVATION +
    ATOMIC PUBLISH OR DISCARD:

    - BEGIN TRAN  -> derive the candidate post-delete snapshot (p26's
      anti-join) WITHOUT touching the base — Spark DataFrames are
      immutable, so the "open transaction" is just a second lineage.
    - audit       -> this query: row/value totals of base vs
      candidate side by side (what a COMMIT would delete).
    - ROLLBACK    -> discard the candidate and RE-DERIVE from the
      base source; the after_rollback phase is recomputed from a
      fresh scan, and the oracle pins it hash-equal to base — the
      rollback-restores-everything proof the reference runs by
      SELECTing the table after ROLLBACK.
    - COMMIT      -> out of scope here but already built: the atomic
      temp-dir+rename publish (`similarity.write_store_atomic`,
      audited end-to-end by d95) is how a validated candidate
      snapshot replaces the base without readers ever seeing a
      half-state.

    Scale shape: two scans + one anti-join, all aggregates map-side;
    the 'transaction' costs nothing until publish, and publish is one
    rename — the snapshot-isolation shape every lakehouse table
    format (public Delta/Iceberg designs) builds on."""
    base = t.lineitem.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(money("l_extendedprice")).cast("double").alias("total_value"),
    )
    denied = t.orders.filter(F.col("o_orderstatus") == "F")
    cand = (
        t.lineitem.join(
            denied, t.lineitem.l_orderkey == denied.o_orderkey, "left_anti"
        ).agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.coalesce(F.sum(money("l_extendedprice")), F.lit(0))
            .cast("double")
            .alias("total_value"),
        )
    )
    # ROLLBACK: recompute from the immutable base source — a fresh
    # lineage, not a cached copy of `base`, so equality is evidence
    rolled = t.lineitem.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(money("l_extendedprice")).cast("double").alias("total_value"),
    )
    tag = lambda df, p: df.select(
        F.lit(p).alias("phase"),
        F.col("n_lines").cast("long").alias("n_lines"),
        "total_value",
    )
    return (
        tag(base, "base")
        .union(tag(cand, "candidate_commit"))
        .union(tag(rolled, "after_rollback"))
        .orderBy("phase")
    )
