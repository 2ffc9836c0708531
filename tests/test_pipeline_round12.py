"""Round-12 pins: store/cache keying by derivation (manifest + plan
identity), the cross-session-stable plan hash, and the skew-guard
verdict cache's hardened key.

Context (r11 verdict item 4 + advice): `source_manifest_key` keyed
trained-artifact stores by file manifest + `semanticHash()`, but that
hash is NOT stable across JVMs — the standing stores were silently
session-local. Round 12 replaces it with `plan_identity` (md5 of the
canonicalized-plan string + schema JSON, measured byte-identical
across processes) and extends the same keying standard to
`_corpus_manifest_key` (d101/s25 cluster store) and the skew-guard
PLAIN-verdict cache.
"""

from __future__ import annotations

import pandas as pd
import pytest


def test_plan_identity_by_derivation_not_exprids(spark, tmp_path):
    """Two constructions of the SAME derivation agree (even though
    their analyzed plans carry different expression ids); a different
    filter or projection over the same files differs; schema-only
    differences (wide projections) are distinguished via the schema
    term."""
    import data_engineer_project_spark.operators.similarity as SIM

    p = str(tmp_path / "t.parquet")
    pd.DataFrame(
        {"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [1.0, 2.0, 3.0]}
    ).to_parquet(p)

    d1 = spark.read.parquet(p).filter("a > 1").select("a", "b")
    d2 = spark.read.parquet(p).filter("a > 1").select("a", "b")
    assert SIM.plan_identity(d1) == SIM.plan_identity(d2)

    d3 = spark.read.parquet(p).filter("a > 2").select("a", "b")
    assert SIM.plan_identity(d3) != SIM.plan_identity(d1)

    d4 = spark.read.parquet(p).filter("a > 1").select("a", "c")
    assert SIM.plan_identity(d4) != SIM.plan_identity(d1)


def test_source_manifest_key_distinguishes_derivations(spark, tmp_path):
    """The r11 correctness property, now pinned directly: two
    different derivations over the SAME files never share a store
    key — and the key is reproducible for the same derivation."""
    import data_engineer_project_spark.operators.similarity as SIM

    p = str(tmp_path / "v.parquet")
    pd.DataFrame(
        {"vec_id": list(range(10)), "x": [float(i) for i in range(10)]}
    ).to_parquet(p)

    base = spark.read.parquet(p)
    k_all = SIM.source_manifest_key(base)
    k_all2 = SIM.source_manifest_key(spark.read.parquet(p))
    k_filtered = SIM.source_manifest_key(base.filter("vec_id < 5"))
    assert k_all is not None and k_filtered is not None
    assert k_all == k_all2
    assert k_filtered != k_all


def test_corpus_manifest_key_distinguishes_derivations(spark, tmp_path):
    """The d101/s25 cluster-store key meets the same standard as the
    trained-artifact stores (r11 verdict item 4): a differently-
    filtered frame over the same files gets a DIFFERENT standing-store
    key, so it can never silently reuse cluster state built for
    another derivation."""
    import data_engineer_project_spark.queries.llm_pipeline as LP

    p = str(tmp_path / "docs.parquet")
    pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["aa", "bb", "cc", "dd"]}
    ).to_parquet(p)

    full = spark.read.parquet(p).select("doc_id", "text")
    half = spark.read.parquet(p).filter("doc_id <= 2").select("doc_id", "text")
    k_full = LP._corpus_manifest_key(full)
    k_half = LP._corpus_manifest_key(half)
    assert k_full.startswith("f") and k_half.startswith("f")
    assert k_full != k_half
    # reproducible for the same derivation (fresh plan objects)
    assert k_full == LP._corpus_manifest_key(
        spark.read.parquet(p).select("doc_id", "text")
    )


def test_probe_verdict_cache_keys_on_derivation_and_rewrite(spark, tmp_path):
    """The skew-guard PLAIN-verdict cache (r11 advice, medium): a
    different derivation over the same files must MISS (a cached plain
    verdict for another band geometry would skip the probe whose sole
    purpose is bounding quadratic tasks), and an in-place data rewrite
    (same path, new size/mtime) must MISS too."""
    import time as _time

    import data_engineer_project_spark.operators.dedup as DD
    from data_engineer_project_spark.operators.cache import release_all

    p = str(tmp_path / "rows.parquet")
    pd.DataFrame(
        {"id": list(range(200)), "key": [str(i % 40) for i in range(200)]}
    ).to_parquet(p)

    def rows():
        release_all()
        return spark.read.parquet(p)

    before = dict(DD._PROBE_VERDICT_CACHE)
    try:
        DD.skew_guarded_self_pairs(
            rows(), ["key"], "id", cap=100, consumer="r12cache"
        ).collect()
        assert DD.LAST_GUARD_STATS["path"] == "plain"
        assert "cached" not in DD.LAST_GUARD_STATS

        # same derivation, same files -> HIT
        DD.skew_guarded_self_pairs(
            rows(), ["key"], "id", cap=100, consumer="r12cache"
        ).collect()
        assert DD.LAST_GUARD_STATS.get("cached") is True

        # different derivation over the SAME files -> MISS
        DD.skew_guarded_self_pairs(
            rows().filter("id < 150"), ["key"], "id", cap=100, consumer="r12cache"
        ).collect()
        assert "cached" not in DD.LAST_GUARD_STATS

        # in-place rewrite (new size/mtime) -> MISS even for the
        # original derivation
        _time.sleep(0.01)  # ensure mtime_ns moves even on coarse clocks
        pd.DataFrame(
            {"id": list(range(220)), "key": [str(i % 40) for i in range(220)]}
        ).to_parquet(p)
        DD.skew_guarded_self_pairs(
            rows(), ["key"], "id", cap=100, consumer="r12cache"
        ).collect()
        assert "cached" not in DD.LAST_GUARD_STATS
    finally:
        DD._PROBE_VERDICT_CACHE.clear()
        DD._PROBE_VERDICT_CACHE.update(before)


def test_plan_identity_none_for_broken_frame(spark):
    """plan_identity/source_manifest_key degrade to None (never raise)
    so callers fall back to content fingerprints."""
    import data_engineer_project_spark.operators.similarity as SIM

    class _Fake:
        @property
        def _jdf(self):
            raise RuntimeError("no jvm")

        @property
        def schema(self):
            raise RuntimeError("no schema")

        def inputFiles(self):
            raise RuntimeError("no files")

    fake = _Fake()
    assert SIM.plan_identity(fake) is None
    assert SIM.source_manifest_key(fake) is None
