"""Round-14 optimization-round invariants: every structural rewrite
for speed must keep results bit-identical. Each test here pins one
r14 plan change against the pre-change implementation or a from-first-
principles recomputation."""

import math
import random

import pytest
from pyspark.sql import functions as F

from data_engineer_project_spark.operators import linalg as LA


def test_exact_jaccard_scores_are_exact(spark):
    """exact_jaccard's verify joins must score every candidate pair
    exactly against the distinct shingle sets — including docs that
    appear only as doc_a, only as doc_b, or on both sides, with
    non-candidate docs present in the shingle set. (Pinned while r14
    A/B'd — and rejected as bench-slower — a semi-join pre-filter of
    the verify sides; any future retry must keep this invariant.)"""
    from data_engineer_project_spark.operators import dedup as DD

    sh = spark.createDataFrame(
        [
            (1, "a b c"), (1, "b c d"), (1, "c d e"),
            (2, "a b c"), (2, "b c d"), (2, "x y z"),
            (3, "a b c"), (3, "p q r"),
            (4, "only doc4"), (4, "never candidate"),
            (5, "a b c"), (5, "b c d"), (5, "c d e"), (5, "q r s"),
        ],
        "doc_id long, shingle string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 5), (3, 5), (2, 3)], "doc_a long, doc_b long"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DD.exact_jaccard(cand, sh).collect()
    }
    # reference: brute-force python over the same distinct sets
    rows = sh.collect()
    sets = {}
    for r in rows:
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    for a, b in [(1, 2), (1, 5), (3, 5), (2, 3)]:
        inter = len(sets[a] & sets[b])
        ref = inter / (len(sets[a]) + len(sets[b]) - inter)
        assert got[(a, b)] == ref, (a, b, got.get((a, b)), ref)
    assert set(got) == {(1, 2), (1, 5), (3, 5), (2, 3)}


def test_power_iteration_dense_matches_exploded_bitwise(spark):
    """The r14 dense (array-form, shuffle-free) power-iteration path
    must return the BIT-IDENTICAL direction and Rayleigh ingredients
    as the exploded two-pass form — exact int64 sums are associative,
    so the only way they could diverge is an implementation bug."""
    rng = random.Random(14)
    d, n = 16, 300
    rows = [
        (i, [rng.gauss(0.0, 1.0) * (1.0 + 0.2 * (j % 5)) for j in range(d)])
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = LA.quantize_embeddings(emb, 1024.0)
    v_ref, stats_ref = LA.power_iteration(q, rounds=3, vscale=128.0)
    qa = LA.quantized_vectors(emb, 1024.0)
    v_new, stats_new = LA.power_iteration_dense(qa, rounds=3, vscale=128.0)
    assert v_new == v_ref
    assert stats_new == stats_ref


def test_power_iteration_dense_guards(spark):
    """The dense path keeps the exploded form's loud-failure contract:
    a-priori int64 headroom refusal and the ragged-dimension check."""
    big = spark.createDataFrame(
        [(0, [2.0 ** 30] * 4), (1, [2.0 ** 30] * 4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="headroom"):
        LA.power_iteration_dense(LA.quantized_vectors(big), rounds=1)
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        LA.power_iteration_dense(LA.quantized_vectors(ragged), rounds=1)


def test_power_iteration_dense_recovers_planted_spike(spark):
    """Same planted-spike recovery bar the exploded operator is held
    to (test_pipeline_round7): |cosine| > 0.99 within 3 rounds."""
    rng = random.Random(7)
    d, n = 16, 400
    spike = [math.sin(0.5 + 0.37 * j) for j in range(d)]
    nrm = math.sqrt(sum(x * x for x in spike))
    spike = [x / nrm for x in spike]
    rows = []
    for i in range(n):
        a = rng.gauss(0.0, 1.0) * 20.0
        vec = [a * spike[j] + rng.gauss(0.0, 1.0) for j in range(d)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qa = LA.quantized_vectors(emb, 1024.0)
    v, stats = LA.power_iteration_dense(qa, rounds=3, vscale=128.0)
    got = [v[p] for p in sorted(v)]
    dot = sum(g * sp for g, sp in zip(got, spike))
    cos = abs(dot) / math.sqrt(sum(g * g for g in got))
    assert cos > 0.99, cos
    seq = [num / vv for num, vv in stats]
    assert seq[0] <= seq[1] <= seq[2]
