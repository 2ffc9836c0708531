"""Structured Streaming surface (SURVEY §2.10 — absent in the
reference, added per the north star): event-time windows with
watermarks, merging session windows, and a custom stateful operator
via applyInPandasWithState.

Design: every transform here is a pure function
``streaming DataFrame -> streaming DataFrame`` so the SAME plan runs
against ``readStream`` in production and is testable with
``trigger(availableNow=True)`` locally. Batch twins of these plans
live in ``queries/llm_pipeline.py`` (e01–e03) — tests assert
streaming == batch on the driver's events table.
"""

from data_engineer_project_spark.streaming.events import (  # noqa: F401
    dedup_counts,
    enrich_with_static,
    ohlc_bars,
    purchases_after_signup,
    read_document_stream,
    read_embedding_stream,
    read_event_stream,
    run_incremental_rollup,
    run_to_memory_table,
    run_to_partitioned_parquet,
    sessionize,
    signups_with_purchase_outcome,
    sliding_totals,
    stateful_user_stats,
    tumbling_counts,
)
