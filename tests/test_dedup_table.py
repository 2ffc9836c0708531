"""Checkpointed-table dedup: the distinct-shingle intermediate
materialized ONCE as a bucketed parquet table and reused across
multiple dedup passes — the 100 TB form of the soft persist() cache
the inline operators use (see dedup.py module docstring). Proves:

- table-backed passes return exactly the inline results;
- the second (and every) pass does NO shingle recompute — its plan
  scans the table, with no text split / posexplode stage;
- the doc-id bucketing satisfies the per-doc aggregation's
  distribution, so the minhash signature build plans with no exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from data_engineer_project_spark.operators import dedup as DD

# Small corpus with an exact dup (1,2), a near-dup pair (3,4), a
# short doc (6) quoted inside a long one (5), and unrelated filler.
CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy dog today"),
    (3, "rain in spain falls mainly on the plain every year"),
    (4, "rain in spain falls mainly on the plain every season"),
    (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (6, "gamma delta epsilon zeta"),
    (7, "completely different words about training data pipelines"),
    (8, "unrelated text mentioning graphs and adjacency structures"),
]


@pytest.fixture(scope="module")
def shingle_tbl(spark):
    df = spark.createDataFrame(CORPUS, "doc_id BIGINT, text STRING")
    spark.sql("DROP TABLE IF EXISTS shingles_t")
    tbl = DD.shingle_table(spark, df, "shingles_t", buckets=4)
    yield df, tbl
    spark.sql("DROP TABLE IF EXISTS shingles_t")


def _pairs(df):
    return sorted((r[0], r[1], round(r[2], 9)) for r in df.collect())


def test_table_backed_passes_match_inline(spark, shingle_tbl):
    """Two different dedup passes reuse ONE materialized shingle table
    and must reproduce the inline (re-exploding) operators exactly."""
    df, tbl = shingle_tbl
    assert _pairs(
        DD.minhash_lsh_pairs_from_shingles(tbl, jaccard_threshold=0.3)
    ) == _pairs(DD.minhash_lsh_pairs(df, jaccard_threshold=0.3))
    assert _pairs(
        DD.containment_pairs_from_shingles(tbl, overlap_threshold=0.5, max_df=10)
    ) == _pairs(DD.containment_pairs(df, overlap_threshold=0.5, max_df=10))
    # the exact-dup pair and the containment pair actually surface
    mh = DD.minhash_lsh_pairs_from_shingles(tbl, jaccard_threshold=0.99).collect()
    assert any((r.doc_a, r.doc_b) == (1, 2) for r in mh)
    ct = DD.containment_pairs_from_shingles(tbl, overlap_threshold=0.9, max_df=10)
    assert any((r.doc_a, r.doc_b) == (5, 6) for r in ct.collect())


def test_table_backed_pass_does_no_shingle_recompute(spark, shingle_tbl):
    """The point of checkpointing: subsequent passes start from the
    columnar table scan — no text scan, no split, no explode."""
    _, tbl = shingle_tbl
    for pass_df in (
        DD.minhash_lsh_pairs_from_shingles(tbl),
        DD.ngram_jaccard_pairs_from_shingles(tbl),
    ):
        plan = pass_df._jdf.queryExecution().executedPlan().toString()
        assert "shingles_t" in plan          # reads the materialized table
        # no shingle recompute: the shingle builder is posexplode(split(
        # text)) + a lead window — none of that may appear. (A bare
        # Generate CAN: band_candidates explodes its band keys.)
        assert "posexplode" not in plan
        assert "split(text" not in plan


def test_bucketing_satisfies_signature_aggregation(spark, shingle_tbl):
    """bucketBy(doc_id) means the per-doc minhash signature groupBy
    needs NO exchange at all — the shuffle the inline form pays on
    every pass is paid once, at table-write time."""
    df, tbl = shingle_tbl
    adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan_tbl = (
            DD.minhash_signatures(tbl)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan_tbl
        inline_sh = DD.exploded_shingles(df).distinct()
        plan_inline = (
            DD.minhash_signatures(inline_sh)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan_inline  # the shuffle the table avoids
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", adaptive)
