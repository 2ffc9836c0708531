from data_engineer_project_spark.queries.catalog import (  # noqa: F401
    QUERIES,
    QuerySpec,
    query,
)

# Import modules for their registration side effects.
from data_engineer_project_spark.queries import tpch  # noqa: F401,E402
from data_engineer_project_spark.queries import practice  # noqa: F401,E402
from data_engineer_project_spark.queries import windows  # noqa: F401,E402
from data_engineer_project_spark.queries import llm_pipeline  # noqa: F401,E402
from data_engineer_project_spark.queries import healthcare  # noqa: F401,E402
from data_engineer_project_spark.queries import streaming_queries  # noqa: F401,E402
from data_engineer_project_spark.queries import multimodal_queries  # noqa: F401,E402

# The driver's correctness gate walks ``queries()`` in dict order and in
# round 1 recorded only the first 50 entries.  Re-rank so the queries
# without a driver-verified row yet come first (reference-parity hq*,
# then the d/e/s/m engine extensions, then untested p*), and the 50
# already green in CORRECTNESS_r01.json come last.  Names are frozen;
# only the iteration order changes.
_R1_GREEN = {
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q4_priority_with_returns", "q10_returned_items",
    "q18_large_volume_customers", "q14_promo_effect", "q19_disjunctive_predicates",
    "q17_small_quantity_revenue", "q22_dormant_customers", "q7_volume_shipping",
    "q8_market_share", "p01_select_project", "p02_select_star", "p03_filter_and",
    "p04_and_or_parens", "p05_like_prefix", "p06_in_list", "p07_between_dates",
    "p08_null_checks", "p09_halfopen_range", "p10_case_banding", "p11_distinct",
    "p12_inner_join_2way", "p13_inner_3way_chain", "p14_left_join_count",
    "p15_right_join", "p16_full_outer_join", "p17_cross_join_top",
    "p18_theta_self_join", "p19_composite_key_join", "p20_expr_key_join",
    "p21_coalesce_key_join", "p22_semi_join_exists", "p23_anti_join_not_exists",
    "p24_five_table_join", "p25_update_with_join", "p26_delete_with_join",
    "p27_count_star", "p28_multi_agg_scalar", "p29_groupby_orderby",
    "p30_having", "p31_sum_null_default", "p32_conditional_agg",
    "p33_flag_agg_max_case", "p34_rowcount_dashboard", "p42_orderby_multikey",
    "p43_topk", "p44_offset_fetch",
}

_FAMILY_RANK = {"h": 0, "d": 1, "e": 2, "s": 3, "m": 4, "p": 5, "q": 6}


def _rank(item):
    index, name = item
    tier = 10 if name in _R1_GREEN else _FAMILY_RANK.get(name[0], 7)
    return (tier, index)


_ordered = sorted(((i, n) for i, n in enumerate(QUERIES)), key=_rank)
_reordered = {name: QUERIES[name] for _, name in _ordered}
QUERIES.clear()
QUERIES.update(_reordered)
