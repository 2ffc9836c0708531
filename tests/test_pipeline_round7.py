"""Semantic pins for the round-7 additions: the incremental curation
rebuild (d64) and its door helper. Each pin re-derives an invariant
independently of the query's own machinery (the round-6 convention).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_project_spark.queries import QUERIES
from data_engineer_project_spark.queries.streaming_queries import (
    _S11_BUCKET,
    s16_door_survivors,
)
from data_engineer_project_spark.sources.registry import Tables


def test_d64_door_is_increment_slicing_invariant(spark, sf_dir):
    """door(inc₁ ∪ inc₂) must equal door(inc₁) ∪ door(inc₂) row-for-row:
    every gate is row-local or joins frozen store artifacts, so slicing
    the increment (here by doc_id parity) cannot change the survivor
    set — the property that makes daily increments composable."""
    t = Tables(spark, sf_dir)
    b = F.expr(_S11_BUCKET)
    inc = t.documents.withColumn("bucket", b).filter(F.col("bucket") >= 50)
    whole = s16_door_survivors(t, inc).collect()
    even = s16_door_survivors(t, inc.filter(F.col("doc_id") % 2 == 0)).collect()
    odd = s16_door_survivors(t, inc.filter(F.col("doc_id") % 2 == 1)).collect()
    assert sorted(map(tuple, even + odd)) == sorted(map(tuple, whole))
    assert whole, "fixture must produce door survivors"


def test_d64_agrees_with_s16_stream_totals(spark, sf_dir):
    """The rebuild folds in exactly what the streaming door admits:
    d64's n_new/token mass must equal s16's complete-mode tally totals
    (stream and batch door share gates and frozen artifacts)."""
    d64 = QUERIES["d64_incremental_curation_rebuild"].fn(spark, sf_dir).collect()
    s16 = QUERIES["s16_stream_curation_front_door"].fn(spark, sf_dir).collect()
    assert sum(r.n_new for r in d64) == sum(r.n_docs for r in s16)
    t = Tables(spark, sf_dir)
    b = F.expr(_S11_BUCKET)
    inc = t.documents.withColumn("bucket", b).filter(F.col("bucket") >= 50)
    door_tokens = (
        s16_door_survivors(t, inc).agg(F.sum("kept_tokens")).collect()[0][0]
    )
    assert door_tokens == sum(r.survivor_tokens for r in s16)


def test_d64_base_docs_are_all_retained(spark, sf_dir):
    """The rebuild never re-curates the store: every stored-corpus doc
    appears in exactly one shard (n_base sums to the store size), and
    shard ids form the dense power-of-two range of the union count."""
    t = Tables(spark, sf_dir)
    b = F.expr(_S11_BUCKET)
    n_store = t.documents.filter(b < 50).count()
    rows = QUERIES["d64_incremental_curation_rebuild"].fn(spark, sf_dir).collect()
    assert sum(r.n_base for r in rows) == n_store
    shards = sorted(r.shard for r in rows)
    n = len(shards)
    assert n & (n - 1) == 0 and shards == list(range(n))


def test_d67_waterfill_invariants(spark, sf_dir):
    """Re-derive the waterfill contract independently: allocations sum
    EXACTLY to the budget (half the corpus tokens), nobody exceeds
    their own mass, uncapped sources keep everything, and capped
    allocations differ by at most 1 (the dealt remainder)."""
    rows = QUERIES["d67_token_budget_waterfill"].fn(spark, sf_dir).collect()
    total = sum(r.orig_tokens for r in rows)
    assert sum(r.alloc_tokens for r in rows) == total // 2
    for r in rows:
        assert r.alloc_tokens <= r.orig_tokens
        if r.uncapped:
            assert r.alloc_tokens == r.orig_tokens
    capped = [r.alloc_tokens for r in rows if not r.uncapped]
    if capped:
        assert max(capped) - min(capped) <= 1
        # every uncapped source is no larger than any capped allocation
        for r in rows:
            if r.uncapped:
                assert r.orig_tokens <= min(capped) + 1


def test_d70_bloom_has_no_false_negatives(spark, sf_dir):
    """A Bloom filter may over-approximate but NEVER under-approximate:
    every true cross-split member must be flagged, i.e. flagged-true
    (n_flagged - n_false_positives) equals n_true_members exactly."""
    (row,) = QUERIES["d70_bloom_membership_sketch"].fn(spark, sf_dir).collect()
    assert row.n_flagged - row.n_false_positives == row.n_true_members
    assert 0 < row.bits_set <= 1 << 16
    assert 0.0 <= row.fp_rate < 1.0


def test_d71_cms_overestimates_only(spark, sf_dir):
    """Count-Min error is one-sided: every estimate >= the exact
    count, and the grid bound (overestimate <= corpus words / 1024
    per row in expectation) stays sane on the fixture."""
    rows = QUERIES["d71_countmin_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_estimate >= r.exact_count
        assert r.overestimate == r.cms_estimate - r.exact_count
        assert r.overestimate >= 0


def test_d72_hll_estimate_within_design_error(spark, sf_dir):
    """HLL with m=256 registers has standard error 1.04/sqrt(m) = 6.5%;
    the realized error on the fixture must stay within 4 sigma of it,
    and the integer harmonic sum must re-derive from the register
    identity sum(2^(41-M_r)) with zero registers contributing 2^41."""
    (row,) = QUERIES["d72_hll_distinct_sketch"].fn(spark, sf_dir).collect()
    assert row.m_registers == 256
    assert 0 < row.registers_used <= 256
    assert 1 <= row.max_rho <= 41
    assert abs(row.rel_error) < 4 * 1.04 / (256 ** 0.5)
    assert row.hll_estimate > 0
    # the estimate actually equals the published formula on the sum
    alpha_num = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 2199023255552.0
    assert row.hll_estimate == alpha_num / float(row.harmonic_sum_scaled)


def test_d73_rayleigh_climbs_within_numpy_bracket(spark, sf_dir):
    """Power iteration on a PSD matrix increases the Rayleigh quotient
    monotonically, and every quotient must sit inside numpy's
    [lambda_min, lambda_max] bracket for the SAME quantized
    second-moment matrix (tiny tolerance for the integer direction
    rescale between rounds)."""
    import numpy as np

    rows = QUERIES["d73_power_iteration_top_pc"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    r = rows[0]
    seq = [r.rayleigh_r1, r.rayleigh_r2, r.rayleigh_r3, r.eigval_quantized]
    for a, b in zip(seq, seq[1:]):
        assert b >= a * (1.0 - 1e-9), seq
    t = Tables(spark, sf_dir)
    emb = np.array(
        [x.embedding for x in t.embeddings.select("embedding").collect()],
        dtype=np.float64,
    )
    q = np.floor(emb * 1024.0)
    w = np.linalg.eigvalsh(q.T @ q)
    n = q.shape[0]
    for lam in seq:
        assert w[0] / n - 1e-6 <= lam <= w[-1] / n * (1.0 + 1e-9), (lam, w[-1] / n)
    assert 0.0 < r.top_share <= 1.0


def test_d73_operator_recovers_planted_spike(spark):
    """On a spectrum WITH a gap the same operator converges fast: a
    planted dominant direction (spike at 20x the noise floor) must be
    recovered with |cosine| > 0.99 within the query's 3 rounds."""
    import math
    import random

    from data_engineer_project_spark.operators import linalg as LA

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
    q = LA.quantize_embeddings(emb, 1024.0)
    v, stats = LA.power_iteration(q, rounds=3, vscale=128.0)
    got = [v[p] for p in sorted(v)]
    dot = sum(g * sp for g, sp in zip(got, spike))
    cos = abs(dot) / math.sqrt(sum(g * g for g in got))
    assert cos > 0.99, cos
    # Rayleigh ingredients must be monotone here too
    seq = [num / vv for num, vv in stats]
    assert seq[0] <= seq[1] <= seq[2]


def test_d74_components_match_d65_and_pick_invariants(spark, sf_dir):
    """d74 runs PageRank over the SAME verified near-dup graph d65
    clusters, so component ids and sizes must match d65 row-for-row;
    on symmetric 2-node clusters both rank picks tie and the min-id
    tiebreak makes the picks agree; every winning rank respects the
    damped floor (>= the 15% base mass)."""
    d65 = {
        r.component: r
        for r in QUERIES["d65_neardup_doc_clusters"].fn(spark, sf_dir).collect()
    }
    d74 = QUERIES["d74_pagerank_canonical_doc"].fn(spark, sf_dir).collect()
    assert {r.component for r in d74} == set(d65)
    for r in d74:
        assert r.cluster_size == d65[r.component].cluster_size
        assert r.canonical_minid == d65[r.component].canonical_doc
        assert r.top_rank >= 150_000
        if r.cluster_size == 2:
            assert r.same_pick, r
        if r.same_pick:
            assert r.canonical_pagerank == r.canonical_minid


def test_s19_bloom_gate_never_passes_a_true_duplicate(spark, sf_dir):
    """Bloom one-sidedness at the door: s19's survivor set must be a
    SUBSET of s11's exact-anti-join survivors (the sketch may only
    over-block novel docs, never under-block a duplicate), and the
    falsely-blocked sliver must be small on the fixture."""
    s11 = {r.doc_id for r in
           QUERIES["s11_stream_dedup_against_corpus"].fn(spark, sf_dir).collect()}
    s19 = {r.doc_id for r in
           QUERIES["s19_stream_bloom_gate"].fn(spark, sf_dir).collect()}
    assert s19 <= s11, s19 - s11
    blocked_novel = len(s11) - len(s19)
    assert blocked_novel <= max(3, len(s11) // 10), (blocked_novel, len(s11))


def test_d75_token_accounting_closes_against_d69(spark, sf_dir):
    """The encoder must agree with the trainer's own ledger: summing
    d75's per-lang BPE token mass reproduces d69's final
    corpus_tokens_after exactly, tokens_saved is non-negative
    everywhere (merges never grow a word), and compression < 1."""
    d69 = QUERIES["d69_bpe_merge_trainer"].fn(spark, sf_dir).collect()
    d75 = QUERIES["d75_bpe_encode_compression"].fn(spark, sf_dir).collect()
    final_tokens = max(d69, key=lambda r: r.round).corpus_tokens_after
    assert sum(r.bpe_tokens for r in d75) == final_tokens
    for r in d75:
        assert 0 <= r.tokens_saved <= r.char_tokens
        assert 0.0 <= r.compression < 1.0


def test_d76_histogram_guarantee_holds_everywhere(spark, sf_dir):
    """The histogram-quantile guarantee re-derived independently: the
    exact percentile (recomputed here with d41's ceil-rank rule over
    collected lengths) must land inside the sketch's picked bin for
    every language, and the bin edges must be width-4 aligned."""
    rows = QUERIES["d76_histogram_quantile_sketch"].fn(spark, sf_dir).collect()
    assert rows, "fixture must produce languages"
    t = Tables(spark, sf_dir)
    by_lang = {}
    for r in t.documents.select("lang", "n_chars", "doc_id").collect():
        by_lang.setdefault(r.lang, []).append((r.n_chars, r.doc_id))
    for r in rows:
        vals = sorted(by_lang[r.lang])
        n = len(vals)
        assert r.n_docs == n
        p50 = vals[(n * 50 + 99) // 100 - 1][0]
        p90 = vals[(n * 90 + 99) // 100 - 1][0]
        assert r.p50_exact == p50 and r.p90_exact == p90
        assert r.p50_bin_lo % 4 == 0 and r.p50_bin_hi == r.p50_bin_lo + 3
        assert r.p50_in_bin and r.p90_in_bin
        assert r.p50_bin_lo <= p50 <= r.p50_bin_hi or r.p50_bin_lo == 255 * 4
        assert 0 < r.bins_used <= 256


def test_e22_burstiness_rederives_from_raw_gaps(spark, sf_dir):
    """Re-derive one user's moments from raw collected timestamps:
    the exact integer n/sum/sumsq must reproduce the query's cv and
    the bounded score must sit in (-1, 1); rows come sorted by cv
    descending with the user_id tiebreak."""
    import math

    rows = QUERIES["e22_user_burstiness"].fn(spark, sf_dir).collect()
    assert rows
    cvs = [(-r.cv, r.user_id) for r in rows]
    assert cvs == sorted(cvs)
    t = Tables(spark, sf_dir)
    uid = rows[0].user_id
    ts = sorted(
        x.us
        for x in t.events.filter(F.col("user_id") == uid)
        .selectExpr("unix_micros(ts) AS us")
        .collect()
    )
    secs = [u // 1_000_000 for u in ts]
    d = [b - a for a, b in zip(secs, secs[1:])]
    n, sd, sq = len(d), sum(d), sum(x * x for x in d)
    assert rows[0].n_gaps == n and rows[0].total_gap_s == sd
    cv = math.sqrt(float(n * sq - sd * sd)) / float(sd)
    assert rows[0].cv == cv
    for r in rows:
        assert -1.0 < r.burstiness < 1.0
        assert r.n_gaps >= 9 and r.total_gap_s > 0


def test_s20_register_state_is_bounded_and_errors_small(spark, sf_dir):
    """The streaming HLL's whole value: per-window register state can
    never exceed m=256 regardless of user cardinality, small windows
    (n < m/4, the linear-counting regime) are exact-ish, and the
    realized error stays within 4 sigma of 1.04/sqrt(256) whenever
    the raw-estimator regime applies."""
    rows = QUERIES["s20_stream_hourly_distinct_hll"].fn(spark, sf_dir).collect()
    assert rows
    sigma4 = 4 * 1.04 / (256 ** 0.5)
    for r in rows:
        assert 0 < r.registers_used <= 256
        assert r.hll_estimate > 0
        if r.exact_users >= 640:  # raw-estimator regime (>= 2.5m)
            assert abs(r.hll_estimate / r.exact_users - 1.0) < sigma4, r
        # small windows: registers_used ~= distinct users (few collisions)
        if r.exact_users <= 64:
            assert r.registers_used <= r.exact_users


def test_d77_rerank_is_exact_over_the_adc_shortlist(spark, sf_dir):
    """Two-phase search invariants: every final pick came from the
    ADC top-10 shortlist, final ranks follow exact cosine (dense 1..3
    per query, descending scores), and the re-ranked top-1 is at
    least as good (by exact cosine) as the ADC top-1's exact score —
    the property that justifies paying for the re-rank."""
    rows = QUERIES["d77_ivfpq_rerank_topk"].fn(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    per_q = defaultdict(list)
    for r in rows:
        per_q[r.query_id].append(r)
        assert 1 <= r.adc_rank <= 10
        assert -1.0 - 1e-9 <= r.exact_cos <= 1.0 + 1e-9
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.final_rank)
        assert [r.final_rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.exact_cos for r in rs]
        assert scores == sorted(scores, reverse=True)
        adc1 = [r for r in rs if r.adc_rank == 1]
        if adc1:
            assert rs[0].exact_cos >= adc1[0].exact_cos - 1e-12


def test_m14_exact_audio_copies_score_jaccard_one(spark, sf_dir):
    """Ground-truth anchor: every pair of docs with IDENTICAL text
    (identical stub payloads => identical envelopes) must appear with
    jaccard exactly 1.0, and every reported pair must clear the 0.5
    threshold with consistent integer sizes."""
    t = Tables(spark, sf_dir)
    dup_pairs = {
        (r.a, r.b)
        for r in t.documents.alias("x")
        .join(
            t.documents.alias("y"),
            (F.col("x.text") == F.col("y.text"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .collect()
    }
    rows = QUERIES["m14_audio_neardup_pairs"].fn(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b): r for r in rows}
    for p in dup_pairs:
        assert p in got and got[p].jaccard == 1.0, p
    for r in rows:
        union = r.n_grams_a + r.n_grams_b - r.n_common
        assert 2 * r.n_common >= union
        assert r.jaccard == r.n_common / union


def test_d78_certificate_exposes_df_shift_leaks(spark, tmp_path):
    """Non-vacuity proof for the certificate: plant a phrase in 1 test
    doc + 51 train docs (df 52 — just past the informative band, so
    round 1 cannot see it) and make exactly 2 of those train docs
    leaky via a separate small-df phrase. Round 1 removes those 2,
    the planted phrase's df drops to 50 — INSIDE the band — and the
    certificate must surface the remaining 49 carriers as residual
    leaks, none of which round 1 reported."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 100

    train = [i for i in range(3000) if bucket(i) < 80]
    test = [i for i in range(3000) if bucket(i) >= 90]
    t1, t2 = test[0], test[1]
    carriers = train[:51]
    leaky2 = carriers[:2]
    hidden = "pa pb pc pd"  # 2 shingles, df 52 round 1
    leakp = "la lb lc ld"  # 2 shingles, df 3 (2 train + t2)
    rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in train[:200] + test[:40]:
        filler = f"u{i}a u{i}b u{i}c u{i}d u{i}e"
        parts = []
        if i == t1 or i in carriers:
            parts.append(hidden)
        if i == t2 or i in leaky2:
            parts.append(leakp)
        parts.append(filler)
        text = " ".join(parts)
        rows["doc_id"].append(i)
        rows["text"].append(text)
        rows["lang"].append("en")
        rows["source"].append("web")
        rows["n_chars"].append(len(text))
    d = tmp_path / "cert"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    for tname in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
        import shutil

        shutil.copy(f"/root/testdata/sf0.001/{tname}.parquet",
                    str(d / f"{tname}.parquet"))
    out = QUERIES["d78_decontamination_certificate"].fn(spark, str(d)).collect()
    (row,) = out
    assert row.residual_leaky == 49, row
    # and round 1 (d55) reported exactly the 2 planted leaks removed
    (d55row,) = QUERIES["d55_clean_train_split"].fn(spark, str(d)).collect()
    assert d55row.n_removed == 2
    assert row.n_clean == d55row.n_clean


def test_d79_mad_is_robust_where_std_is_not(spark, sf_dir):
    """Re-derive one language's median/MAD from raw lengths (numpy
    median differs on even n — use the ceil-rank rule) and check the
    gate's defining property on a planted corpus: adding one giant
    outlier moves the mean/std gate's threshold but leaves median and
    MAD unchanged."""
    rows = QUERIES["d79_robust_mad_outlier_gate"].fn(spark, sf_dir).collect()
    t = Tables(spark, sf_dir)
    lens = {}
    for r in t.documents.select("lang", "n_chars", "doc_id").collect():
        lens.setdefault(r.lang, []).append((r.n_chars, r.doc_id))
    for r in rows:
        vals = sorted(lens[r.lang])
        n = len(vals)
        med = vals[(n * 50 + 99) // 100 - 1][0]
        assert r.median_chars == med
        ads = sorted((abs(v - med), d) for v, d in vals)
        mad = ads[(n * 50 + 99) // 100 - 1][0]
        assert r.mad_chars == mad
        n_out = sum(1 for a, _ in ads if a * 10000 > 3 * 14826 * mad)
        assert r.n_outliers == n_out
    # robustness property, pure python: a planted 100x outlier shifts
    # mean+std massively but the integer median/MAD not at all
    base = [100] * 50 + [110] * 49
    med0 = sorted(base)[(99 * 50 + 99) // 100 - 1]
    spiked = base + [10_000]
    med1 = sorted(spiked)[(100 * 50 + 99) // 100 - 1]
    assert med0 == med1 == 100


def test_e23_lift_identity_and_bounds(spark, sf_dir):
    """Re-derive the lift identity from the row's own integers
    (lift = n_both * n_sessions / (n_a * n_b)), check the pair counts
    against e03's session count, and the Frechet bounds
    n_both <= min(n_a, n_b)."""
    rows = QUERIES["e23_session_type_lift"].fn(spark, sf_dir).collect()
    assert rows
    n_sessions = rows[0].n_sessions
    e03 = QUERIES["e03_sessionization"].fn(spark, sf_dir).collect()
    assert n_sessions == len(e03)
    for r in rows:
        assert r.n_sessions == n_sessions
        assert 0 < r.n_both <= min(r.n_a, r.n_b) <= n_sessions
        assert r.lift == (r.n_both * n_sessions) / (r.n_a * r.n_b)
        assert r.support == r.n_both / n_sessions
        assert r.type_a < r.type_b


def test_hq34_rederives_from_claim_payments(spark, sf_dir):
    """Re-derive the member cost distribution from the raw fixture
    frames: totals in exact cents, the ceil-rank median/MAD, the
    outlier rule, and the top-member argmax must all match."""
    from data_engineer_project_spark.queries.healthcare import hc

    (row,) = QUERIES["hq34_member_cost_outliers"].fn(spark, sf_dir).collect()
    t = Tables(spark, sf_dir)
    s = hc(t)
    members = {r.MemberID for r in
               s["s1_elig_enrollment"].select("MemberID").distinct().collect()}
    paid = {}
    hdr = {r.ClaimID: r.MemberID
           for r in s["s2_claims_claim_header"].collect()}
    for r in s["s2_claims_claim_payment"].collect():
        m = hdr.get(r.ClaimID)
        if m is not None:
            paid[m] = paid.get(m, 0) + round(float(r.PaidAmount) * 100)
    cents = {m: paid.get(m, 0) for m in members}
    vals = sorted((c, m) for m, c in cents.items())
    n = len(vals)
    med = vals[(n * 50 + 99) // 100 - 1][0]
    ads = sorted((abs(c - med), m) for m, c in cents.items())
    mad = ads[(n * 50 + 99) // 100 - 1][0]
    assert row.n_members == n
    assert row.median_cents == med
    assert row.mad_cents == mad
    assert row.n_outliers == sum(
        1 for a, _ in ads if a * 10000 > 3 * 14826 * mad
    )
    top = max((c, -m) for m, c in cents.items())
    assert row.top_cents == top[0] and row.top_member == -top[1]


def test_e24_matches_numpy_corrcoef_on_the_dense_series(spark, sf_dir):
    """Re-derive one type's lag-24 autocorrelation with numpy over an
    independently zero-filled hourly series — the values must agree to
    float tolerance, every r must be a valid correlation in [-1, 1],
    and n_hours must equal the global span for every type."""
    import numpy as np

    rows = QUERIES["e24_diurnal_autocorrelation"].fn(spark, sf_dir).collect()
    assert rows
    spans = {r.n_hours for r in rows}
    assert len(spans) == 1
    t = Tables(spark, sf_dir)
    ty = rows[0].event_type
    hs = [
        r.h
        for r in t.events.filter(F.col("event_type") == ty)
        .selectExpr("unix_micros(ts) div 1000000 div 3600 AS h")
        .collect()
    ]
    lo = min(
        r.h for r in t.events.selectExpr(
            "min(unix_micros(ts) div 1000000 div 3600) AS h"
        ).collect()
    )
    n_hours = rows[0].n_hours
    series = np.zeros(n_hours)
    for h in hs:
        series[h - lo] += 1
    want = float(np.corrcoef(series[:-24], series[24:])[0, 1])
    got = rows[0].r_lag24
    assert abs(got - want) < 1e-9, (got, want)
    for r in rows:
        for v in (r.r_lag1, r.r_lag24):
            assert v is None or -1.0 - 1e-12 <= v <= 1.0 + 1e-12


def test_e25_flag_counts_match_a_python_rebaseline(spark, sf_dir):
    """Re-derive both baselines in pure Python over an independently
    zero-filled grid: per-type flat and per-(type, hour-of-day) moment
    sums, the one-sided cross-multiplied 2-sigma rule, and the peak
    hour argmax must all match the query's counts exactly."""
    rows = QUERIES["e25_seasonal_rebaseline"].fn(spark, sf_dir).collect()
    assert rows
    t = Tables(spark, sf_dir)
    obs = (
        t.events.selectExpr(
            "event_type", "unix_micros(ts) div 1000000 div 3600 AS h"
        )
        .groupBy("event_type", "h")
        .count()
        .collect()
    )
    lo = min(r.h for r in obs)
    hi = max(r.h for r in obs)
    span = range(lo, hi + 1)
    types = {r.event_type for r in obs}
    cnt = {(r.event_type, r.h): r["count"] for r in obs}
    for out in rows:
        ty = out.event_type
        assert ty in types
        series = {h: cnt.get((ty, h), 0) for h in span}
        xs = list(series.values())
        n, s, ss = len(xs), sum(xs), sum(x * x for x in xs)
        assert out.n_hours == n
        flat = sum(
            1
            for x in xs
            if x * n - s > 0 and (x * n - s) ** 2 > 4 * (n * ss - s * s)
        )
        assert out.n_flag_flat == flat
        hod_stats = {}
        for h, x in series.items():
            k = h % 24
            nh, sh, ssh = hod_stats.get(k, (0, 0, 0))
            hod_stats[k] = (nh + 1, sh + x, ssh + x * x)
        seas = 0
        for h, x in series.items():
            nh, sh, ssh = hod_stats[h % 24]
            if x * nh - sh > 0 and (x * nh - sh) ** 2 > 4 * (
                nh * ssh - sh * sh
            ):
                seas += 1
        assert out.n_flag_seasonal == seas
        peak = max((sh, -k) for k, (nh, sh, ssh) in hod_stats.items())
        assert out.peak_hod == -peak[1] and out.peak_hod_events == peak[0]


def test_d80_scores_match_a_python_tfidf(spark, sf_dir):
    """Re-derive tf, corpus-wide df, and the rational-idf score with
    Python counters; the per-doc top-3 under (score desc, term asc)
    must match the query's rows and ranks exactly."""
    rows = QUERIES["d80_tfidf_doc_keywords"].fn(spark, sf_dir).collect()
    assert rows
    t = Tables(spark, sf_dir)
    docs = [(r.doc_id, r.text.split(" ")) for r in t.documents.collect()]
    n_docs = len(docs)
    df = {}
    for _, toks in docs:
        for term in set(toks):
            df[term] = df.get(term, 0) + 1
    want = []
    for did, toks in sorted(docs):
        if did >= 20:
            continue
        tf = {}
        for term in toks:
            tf[term] = tf.get(term, 0) + 1
        scored = sorted(
            (
                -(tfv * (2 * n_docs - 2 * df[term] + 1)) / (2 * df[term] + 1),
                term,
                tfv,
            )
            for term, tfv in tf.items()
        )[:3]
        for rk, (neg, term, tfv) in enumerate(scored, 1):
            want.append((did, rk, term, tfv, df[term], -neg))
    got = [
        (r.doc_id, r.rank, r.term, r.tf, r.df, r.score) for r in rows
    ]
    assert got == want
    assert len(got) == 3 * sum(1 for d, _ in docs if d < 20)


def test_hq35_oe_aggregation_identities(spark, sf_dir):
    """Band totals must re-aggregate from the provider rows (the O/E
    denominator is consistent with the numerators it normalizes), the
    expected-cost-weighted mean O/E must be exactly 1 per tier (the
    indirect-standardization identity), and every claim's tier must be
    the member's LATEST risk score re-derived from the fixture."""
    from data_engineer_project_spark.queries.healthcare import hc

    rows = QUERIES["hq35_provider_case_mix_oe"].fn(spark, sf_dir).collect()
    assert rows
    by_tier = {}
    for r in rows:
        a = by_tier.setdefault(r.tier, [0, 0, r.band_n, r.band_cents])
        a[0] += r.n_claims
        a[1] += r.observed_cents
    for tier, (nc, oc, bn, bc) in by_tier.items():
        assert (nc, oc) == (bn, bc), tier
    # Σ observed = Σ expected within each tier ⇒ weighted mean O/E = 1:
    # expected_cents for a provider row is n_claims * band_cents / band_n,
    # and Σ_providers n_claims = band_n, so Σ expected = band_cents = Σ obs.
    for r in rows:
        if r.oe_ratio is not None and r.band_cents > 0:
            expected = r.n_claims * r.band_cents / r.band_n
            assert abs(r.oe_ratio - r.observed_cents / expected) < 1e-12
    s = hc(Tables(spark, sf_dir))
    latest = {}
    for rs in s["s3_cca_risk_score"].collect():
        key = rs.MemberID
        cand = (rs.EffectiveDate, rs.RiskID, rs.RiskTier)
        if key not in latest or cand[:2] > latest[key][:2]:
            latest[key] = cand
    tiers_in_output = {r.tier for r in rows}
    assert tiers_in_output <= (
        {v[2] for v in latest.values()} | {"UNSCORED"}
    )


def test_s21_cms_is_one_sided_and_rederives_from_event_counts(spark, sf_dir):
    """CMS one-sidedness (every estimate >= its exact count — a min of
    counters that each saw all of the key's events), the exact counts
    re-derived with a Python counter over the raw events, the top-10
    selection verified, and the expected-error bound N/w respected on
    average (Markov margin x4)."""
    rows = QUERIES["s21_stream_countmin_heavy_users"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    t = Tables(spark, sf_dir)
    counts = {}
    for r in t.events.select("user_id").collect():
        if r.user_id is not None:
            counts[r.user_id] = counts.get(r.user_id, 0) + 1
    want_top = sorted(((-c, u) for u, c in counts.items()))[:10]
    got_top = [(-r.exact_count, r.user_id) for r in rows]
    assert got_top == want_top
    n_events = sum(counts.values())
    for r in rows:
        assert r.cms_estimate >= r.exact_count
        assert r.overestimate == r.cms_estimate - r.exact_count
    mean_over = sum(r.overestimate for r in rows) / len(rows)
    assert mean_over <= 4 * n_events / 1024


def test_d81_votes_rederive_from_python_counts(spark, sf_dir):
    """d81's sign-quantized DSIR scores must equal a from-scratch
    Python rebuild: hash every token with hashlib.md5, tally the
    target/raw bucket distributions, vote each bucket by the smoothed
    cross-multiplied rate comparison (exact ints — Python ints can't
    overflow, so this independently checks the 128-bit Spark/DuckDB
    arithmetic), then score raw docs and take the same top-10."""
    import hashlib

    from data_engineer_project_spark.sources.registry import Tables

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "lang", "text").collect()
    ct: dict[str, int] = {}
    cr: dict[str, int] = {}
    per_doc: dict[int, tuple[str, list[str]]] = {}
    for r in docs:
        buckets = [
            hashlib.md5(w.encode()).hexdigest()[:2] for w in r.text.split(" ")
        ]
        tally = ct if r.lang == "en" else cr
        for b in buckets:
            tally[b] = tally.get(b, 0) + 1
        if r.lang != "en":
            per_doc[r.doc_id] = (r.lang, buckets)
    nt, nr = sum(ct.values()), sum(cr.values())
    vote = {}
    for b in set(ct) | set(cr):
        lt = (ct.get(b, 0) + 1) * (nr + 256)
        lr = (cr.get(b, 0) + 1) * (nt + 256)
        vote[b] = 1 if lt > lr else (-1 if lt < lr else 0)
    scored = sorted(
        (
            (
                -sum(vote[b] for b in buckets) / len(buckets),
                doc_id,
                lang,
                len(buckets),
                sum(vote[b] for b in buckets),
            )
            for doc_id, (lang, buckets) in per_doc.items()
        )
    )[:10]
    got = QUERIES["d81_dsir_hashed_importance"].fn(spark, sf_dir).collect()
    assert len(got) == 10
    for rank0, (neg_share, doc_id, lang, n_tok, vs) in enumerate(scored):
        row = got[rank0]
        assert (row.rank, row.doc_id, row.lang, row.n_tokens, row.vote_sum) == (
            rank0 + 1,
            doc_id,
            lang,
            n_tok,
            vs,
        )
        assert row.vote_share == vs / n_tok  # same IEEE division
    # the scorer must discriminate: raw docs lean raw ON AVERAGE, and
    # the selected top-10 sit strictly above the raw-pool mean share
    shares = [
        sum(vote[b] for b in bs) / len(bs) for _, (_, bs) in per_doc.items()
    ]
    mean_share = sum(shares) / len(shares)
    assert mean_share < 0
    assert min(r.vote_share for r in got) > mean_share


def test_e26_km_rederives_and_survival_invariants(spark, sf_dir):
    """e26's life table must equal a from-scratch Python Kaplan-Meier
    over the raw events (durations, risk sets, and the product-limit
    fold re-derived independently), and the estimator's structural
    invariants must hold: survival is non-increasing in (0, 1], flat
    exactly on event-free days, and risk sets telescope by the exits."""
    import datetime

    from data_engineer_project_spark.sources.registry import Tables

    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", "ts", "value").collect()
    t0: dict[int, datetime.datetime] = {}
    for r in ev:
        if r.event_type == "signup":
            if r.user_id not in t0 or r.ts < t0[r.user_id]:
                t0[r.user_id] = r.ts
    t1: dict[int, datetime.datetime] = {}
    for r in ev:
        if (
            r.event_type == "purchase"
            and r.value >= 180.0
            and r.user_id in t0
            and r.ts >= t0[r.user_id]
        ):
            if r.user_id not in t1 or r.ts < t1[r.user_id]:
                t1[r.user_id] = r.ts
    tend = max(r.ts for r in ev)
    table: dict[int, list[int]] = {}
    for u, start in t0.items():
        end, is_ev = (t1[u], 1) if u in t1 else (tend, 0)
        d = (end.date() - start.date()).days
        table.setdefault(d, [0, 0])[0 if is_ev else 1] += is_ev or 1
    # table[d] = [n_events, n_censored]
    got = QUERIES["e26_km_conversion_survival"].fn(spark, sf_dir).collect()
    assert [r.day for r in got] == sorted(table)
    at_risk = len(t0)
    surv = 1.0
    for row in got:
        n_ev, n_cen = table[row.day]
        assert (row.n_events, row.n_censored, row.n_risk) == (
            n_ev,
            n_cen,
            at_risk,
        )
        surv = surv * ((at_risk - n_ev) / at_risk)  # same IEEE fold order
        assert row.survival == surv
        at_risk -= n_ev + n_cen
    assert at_risk == 0  # every cohort member exits exactly once
    # structural invariants
    assert all(0.0 < r.survival <= 1.0 for r in got)
    for prev, cur in zip(got, got[1:]):
        assert cur.survival <= prev.survival
        if cur.n_events == 0:
            assert cur.survival == prev.survival
    assert sum(r.n_events for r in got) == len(t1)
    assert sum(r.n_censored for r in got) == len(t0) - len(t1)
    assert got and got[0].n_risk == len(t0)


def _sixth_wave_dir(tmp_path, documents=None, events=None):
    """Materialize a custom corpus dir (d78's pattern): write the
    overridden tables, copy the rest from sf0.001."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "wave6"
    d.mkdir()
    for name, rows in (("documents", documents), ("events", events)):
        if rows is not None:
            pq.write_table(pa.table(rows), str(d / f"{name}.parquet"))
    for tname in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"):
        if not (d / f"{tname}.parquet").exists():
            shutil.copy(f"/root/testdata/sf0.001/{tname}.parquet",
                        str(d / f"{tname}.parquet"))
    return str(d)


def test_d81_planted_target_doc_is_selected_first(spark, tmp_path):
    """Non-vacuity: a raw doc written ENTIRELY in the target domain's
    vocabulary must come out rank 1 with vote_share exactly 1.0, and
    raw docs sharing no vocabulary with the target must score exactly
    -1.0 — the scorer SELECTS target-like content, it doesn't just
    mirror counts. Tokens are chosen with pairwise-distinct md5
    bucket prefixes so no hash collision can couple the two
    vocabularies."""
    import hashlib

    toks, seen = [], set()
    i = 0
    while len(toks) < 12:
        c = f"w{i}"
        p = hashlib.md5(c.encode()).hexdigest()[:2]
        if p not in seen:
            seen.add(p)
            toks.append(c)
        i += 1
    tgt_vocab, raw_vocab = toks[:6], toks[6:]
    rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}

    def add(doc_id, text, lang):
        rows["doc_id"].append(doc_id)
        rows["text"].append(text)
        rows["lang"].append(lang)
        rows["source"].append("web")
        rows["n_chars"].append(len(text))

    for j in range(50):  # target corpus: en docs over tgt_vocab
        add(j, " ".join(tgt_vocab), "en")
    for j in range(50, 80):  # raw pool: de docs over raw_vocab
        add(j, " ".join(raw_vocab), "de")
    add(999, " ".join(tgt_vocab), "de")  # the plant: raw doc, target vocab
    out = QUERIES["d81_dsir_hashed_importance"].fn(
        spark, _sixth_wave_dir(tmp_path, documents=rows)
    ).collect()
    assert out[0].doc_id == 999 and out[0].rank == 1
    assert out[0].vote_share == 1.0  # every bucket it touches leans target
    assert all(r.vote_share == -1.0 for r in out[1:])  # pure-raw docs
    assert [r.doc_id for r in out[1:]] == list(range(50, 59))  # id tiebreak


def test_e26_reduces_to_ecdf_when_nothing_is_censored(spark, tmp_path):
    """Estimator semantics: with zero censoring the product-limit
    estimate must telescope to the empirical survival function
    (N - cum_events) / N at every day — KM generalizes the ECDF, it
    must not disagree with it on complete data."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = {"event_id": [], "ts": [], "user_id": [], "event_type": [],
            "value": [], "props": []}

    def add(eid, ts, uid, etype, value):
        rows["event_id"].append(eid)
        rows["ts"].append(ts)
        rows["user_id"].append(uid)
        rows["event_type"].append(etype)
        rows["value"].append(value)
        rows["props"].append("{}")

    n_users, eid = 40, 0
    for u in range(n_users):
        add(eid, base + datetime.timedelta(hours=u), u, "signup", 0.0)
        eid += 1
        # conversion after (u % 7) full days — every user converts
        add(eid, base + datetime.timedelta(hours=u, days=u % 7, minutes=5),
            u, "purchase", 200.0)
        eid += 1
    add(eid, base + datetime.timedelta(days=30), 0, "view", 0.0)  # study end
    out = QUERIES["e26_km_conversion_survival"].fn(
        spark, _sixth_wave_dir(tmp_path, events=rows)
    ).collect()
    assert sum(r.n_censored for r in out) == 0
    assert [r.day for r in out] == sorted(set(u % 7 for u in range(n_users)))
    cum = 0
    for r in out:
        cum += r.n_events
        assert abs(r.survival - (n_users - cum) / n_users) < 1e-12
    assert out[-1].survival == 0.0 if cum == n_users else True
    assert cum == n_users
