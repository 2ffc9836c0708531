"""Multimodal plumbing checks beyond the oracle gate: the physical
plan must prune the binary column for metadata-only queries, the real
codec path must be a clearly-gated stub, and frame/resize stages must
produce the exact payload bytes (not just matching counts)."""

from __future__ import annotations

import pytest

from data_engineer_project_spark.operators.multimodal import (
    attach_media,
    decode_media,
    resize_media,
    sample_frames,
)
from data_engineer_project_spark.sources.registry import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_tables(spark, SF).documents


def test_metadata_query_prunes_binary_column(spark, docs):
    """Selecting only metadata must not read `text` payload bytes in
    vain — ReadSchema shows which columns reach the parquet scan."""
    plan = (
        attach_media(docs)
        .select("doc_id", "media_format")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_real_codec_path_is_gated(docs):
    with pytest.raises(Exception) as ei:
        decode_media(attach_media(docs), use_real_codec=True).limit(1).collect()
    # NotImplementedError surfaces wrapped in Spark's Python exception
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frames_are_exact_payload_slices(docs):
    media = attach_media(docs).limit(5)
    rows = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}
    frames = sample_frames(media, frame_bytes=64, every=2).collect()
    assert frames
    for f in frames:
        payload = rows[f["doc_id"]]
        lo = f["frame_no"] * 64
        assert bytes(f["frame"]) == payload[lo : lo + 64]
        assert f["frame_no"] % 2 == 0


def test_resize_keeps_every_kth_byte(docs):
    media = attach_media(docs).limit(5)
    orig = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}
    for r in resize_media(media, keep_every=3).collect():
        assert bytes(r["media"]) == orig[r["doc_id"]][::3]
        assert r["n_bytes"] == len(bytes(r["media"]))


def test_audio_energy_skips_empty_and_null_payloads(spark):
    """Zero-length / NULL media must produce NO row — the SQL oracle's
    per-character unnest emits nothing for a charless doc, and
    np.frombuffer would raise on None. Defined semantics: skip."""
    from data_engineer_project_spark.operators.multimodal import (
        audio_window_energy,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"abcd")), (2, bytearray(b"")), (3, None)],
        "doc_id BIGINT, media BINARY",
    )
    rows = {r["doc_id"]: r for r in audio_window_energy(media, window=2).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_windows"] == 2
