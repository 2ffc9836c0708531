"""Data-release governance operators.

``small_cell_suppress`` generalizes the CMS small-cell rule hq45
introduced (cells under k members suppressed, plus one complementary
round per stratum so a stratum total with exactly ONE suppressed cell
cannot be subtracted back) into a composable operator over ANY
aggregated cell table — the round-8 verdict's ask: member-grain
healthcare outputs should be able to bolt the release gate on without
re-implementing the rule.

Scale notes (100 TB): suppression runs on an already-aggregated cell
table (geography × measure × plan-sized — bounded, nowhere near data
scale); the windows partition by the stratum columns and the operator
adds no corpus-scale shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def small_cell_suppress(
    cells: DataFrame,
    k: int = 11,
    stratum_cols: Sequence[str] = ("county",),
    cell_cols: Sequence[str] = ("measure_id",),
    n_col: str = "n",
    mask_cols: Sequence[str] = (),
) -> DataFrame:
    """CMS small-cell suppression over an aggregated cell table.

    PRIMARY: any cell with ``n_col`` < k is suppressed. COMPLEMENTARY:
    within a stratum (``stratum_cols`` group) holding EXACTLY ONE
    primary cell, the smallest unsuppressed cell (ties → lowest
    ``cell_cols``) is suppressed too, otherwise the stratum total
    lets readers subtract the primary cell back. Suppressed rows
    release NULL for the count and every ``mask_cols`` value, plus a
    reason tag ('primary' / 'complementary'); released rows pass
    through unchanged — the downstream publisher never sees a small
    count at all.

    Output columns: stratum_cols + cell_cols + ``released_<n_col>`` +
    ``released_<c>`` per mask col + suppressed + suppression."""
    prim = cells.withColumn("_is_primary", F.col(n_col) < k)
    w_cnt = Window.partitionBy(*stratum_cols)
    order_keys = [
        F.when(F.col("_is_primary"), F.lit(None))
        .otherwise(F.col(c))
        .asc_nulls_last()
        for c in (n_col, *cell_cols)
    ]
    marked = prim.withColumn(
        "_n_prim", F.sum(F.col("_is_primary").cast("long")).over(w_cnt)
    ).withColumn(
        "_rn_small",
        F.when(
            ~F.col("_is_primary"),
            F.row_number().over(
                Window.partitionBy(*stratum_cols).orderBy(*order_keys)
            ),
        ),
    )
    is_comp = (F.col("_n_prim") == 1) & (F.col("_rn_small") == 1)
    suppressed = F.col("_is_primary") | is_comp
    return marked.select(
        *stratum_cols,
        *cell_cols,
        F.when(~suppressed, F.col(n_col)).cast("long").alias(f"released_{n_col}"),
        *[
            F.when(~suppressed, F.col(c)).alias(f"released_{c}")
            for c in mask_cols
        ],
        suppressed.alias("suppressed"),
        F.when(F.col("_is_primary"), F.lit("primary"))
        .when(is_comp, F.lit("complementary"))
        .alias("suppression"),
    )
