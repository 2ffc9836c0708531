"""Round-9 semantic pin tests (beyond oracle parity).

d99: the weighted near-dup cluster twin must (a) agree with d65
cluster-for-cluster in uncollapsed units, and (b) be duplication-
invariant — the property that lets it run decades past d65's
multiplicity-quadratic pair set.
"""
from __future__ import annotations

from data_engineer_project_spark.queries import QUERIES
from tests.test_pipeline_round8 import _write_tables


def test_d99_matches_d65_cluster_for_cluster(spark):
    """Every cluster d65 reports must appear in d99 keyed by the same
    canonical doc with identical uncollapsed stats; d99's only extras
    are short-doc (< 3 token, shingle-less) exact-dup groups that
    d65's shingle pipeline structurally cannot see."""
    sf = "/root/testdata/sf0.001"
    d65 = {
        r.canonical_doc: (r.cluster_size, r.total_tokens, r.dup_tokens)
        for r in QUERIES["d65_neardup_doc_clusters"].fn(spark, sf).collect()
    }
    d99 = {
        r.canonical_doc: (r.total_docs, r.total_tokens, r.dup_tokens)
        for r in QUERIES["d99_weighted_neardup_clusters"].fn(spark, sf).collect()
    }
    assert d65, "vacuous: corpus has no near-dup clusters"
    for canon, stats in d65.items():
        assert d99.get(canon) == stats, f"cluster {canon}: {d99.get(canon)} != {stats}"
    # extras must all be shingle-less exact-dup groups
    extras = set(d99) - set(d65)
    import pyarrow.parquet as pq

    tb = pq.read_table(f"{sf}/documents.parquet").to_pydict()
    tok = {i: len(t.split(" ")) for i, t in zip(tb["doc_id"], tb["text"])}
    for canon in extras:
        assert tok[canon] < 3, (
            f"extra d99 cluster {canon} has {tok[canon]} tokens — "
            "should have been visible to d65"
        )


def test_d99_is_duplication_invariant(spark, tmp_path):
    """Replicating every document 3x (fresh high doc_ids, identical
    text) must leave d99's near-dup components, rep counts, canonical
    picks, and PER-COPY token numbers identical — only total_docs /
    total_tokens / dup_tokens scale with multiplicity, and previously
    unique texts surface as exact-dup singletons of total_docs=3."""
    import pyarrow.parquet as pq

    base = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    d = base.to_pydict()
    n = len(d["doc_id"])
    rep = {k: list(v) for k, v in d.items()}
    for copy in (1, 2):
        for i in range(n):
            rep["doc_id"].append(10_000_000 * copy + d["doc_id"][i])
            rep["text"].append(d["text"][i])
            rep["lang"].append(d["lang"][i])
            rep["source"].append(d["source"][i])
            rep["n_chars"].append(d["n_chars"][i])
    sf3 = _write_tables(tmp_path, "d99_3x", documents=rep)

    one = {
        r.component: r
        for r in QUERIES["d99_weighted_neardup_clusters"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    three = {
        r.component: r
        for r in QUERIES["d99_weighted_neardup_clusters"].fn(spark, sf3).collect()
    }
    # every 1x cluster persists with the same reps/canonical and
    # exactly tripled doc mass; per-copy token arithmetic is fixed:
    # at 3x, total'=3*total and dup'=3*total - canon_tok
    #               = 3*(total - canon_tok) + 2*canon_tok
    for comp, r1 in one.items():
        r3 = three[comp]
        assert (r3.n_reps, r3.canonical_doc) == (r1.n_reps, r1.canonical_doc)
        assert r3.total_docs == 3 * r1.total_docs
        assert r3.total_tokens == 3 * r1.total_tokens
        canon_tok = r1.total_tokens - r1.dup_tokens
        assert r3.dup_tokens == 3 * r1.total_tokens - canon_tok
    # the 3x corpus mints a singleton cluster (n_reps=1, total_docs=3)
    # for every previously-unique text — count them exactly
    extras = set(three) - set(one)
    assert all(
        three[c].n_reps == 1 and three[c].total_docs == 3 for c in extras
    )
    # reps in 1x clusters + extras = total distinct texts
    n_distinct = len(set(d["text"]))
    n_in_old = sum(r.n_reps for r in one.values())
    assert n_in_old + len(extras) == n_distinct
    # non-vacuity: the graph genuinely collapsed multiplicity
    assert any(r.total_docs > r.n_reps for r in three.values())


def test_skew_guard_pairs_identical_and_bounded(spark):
    """The hot-band skew guard must leave the pair set bit-identical
    to the naive self-join while bounding every grid cell to ~cap²
    pairs — the planted-hot-key contract from the round-8 verdict."""
    import pyspark.sql.functions as F

    from data_engineer_project_spark.operators.dedup import (
        skew_guarded_self_pairs,
    )

    # one hot key (300 members), two cold keys
    rows = [(i, "hot") for i in range(300)]
    rows += [(1000 + i, "cold_a") for i in range(10)]
    rows += [(2000 + i, "cold_b") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, key string")

    cap = 50
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in skew_guarded_self_pairs(df, ["key"], "id", cap=cap).collect()
    )
    naive = sorted(
        (a, b)
        for ids in ([i for i in range(300)],
                    [1000 + i for i in range(10)],
                    [2000 + i for i in range(5)])
        for a in ids for b in ids if a < b
    )
    assert got == naive  # pair set unchanged, no dup, no loss

    # grid bound: recompute the deterministic salts the guard uses and
    # check no (i, j) cell of the hot key exceeds ~cap² pairs — i.e.
    # no single join task owns the quadratic bucket
    nsplit = -(-300 // cap)  # ceil
    salts = {
        r.id: r.s
        for r in df.filter(F.col("key") == "hot")
        .select("id", F.pmod(F.xxhash64("id"), F.lit(nsplit)).alias("s"))
        .collect()
    }
    from collections import Counter

    cells = Counter(
        (salts[a], salts[b]) for a, b in naive if a < 300 and b < 300
    )
    assert len(cells) > 1, "hot key was not split"
    assert max(cells.values()) <= cap * cap
    # and the dominant cell holds a small fraction of the bucket's pairs
    assert max(cells.values()) < 0.25 * (300 * 299 / 2)


def test_skew_guard_planted_blank_band_has_no_dominant_task(spark):
    """End-shape check at the verdict's scale: thousands of DISTINCT
    ids sharing ONE band key (the blank-payload band) still produce
    exactly C(n,2) candidate pairs, generated across a salted grid
    rather than one task."""
    import pyspark.sql.functions as F

    from data_engineer_project_spark.operators.dedup import (
        skew_guarded_self_pairs,
    )

    n = 3000
    df = spark.range(n).select(
        F.col("id"), F.lit("blank").alias("key")
    )
    pairs = skew_guarded_self_pairs(df, ["key"], "id", cap=250)
    assert pairs.count() == n * (n - 1) // 2


def test_png_codec_roundtrip_filters_and_quarantine():
    """The dependency-free PNG decoder must (a) roundtrip encode_png,
    (b) reverse all five scanline filters against an independent naive
    reference built in this test, (c) match the m16 oracle's container
    size arithmetic exactly, and (d) raise ValueError (quarantine),
    never a zlib/struct internal, on truncation or CRC lies."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from data_engineer_project_spark.operators.multimodal import (
        _PNG_STORE_BLOCK,
        _real_decode,
        _zlib_stored,
        decode_png,
        encode_png,
    )

    px = bytes(range(256)) * 10
    assert decode_png(encode_png(px, 32)).tobytes() == px

    # container size formula (what the m16 oracle recomputes in SQL)
    for w, n in ((16, 17), (63, 5000), (20, 70000)):
        h = -(-n // w)
        p = encode_png(bytes(i % 251 for i in range(w * h)), w)
        raw = h * (w + 1)
        assert len(p) == 63 + 5 * (-(-raw // _PNG_STORE_BLOCK)) + raw

    big = bytes(i % 256 for i in range(100_000))
    assert zlib.decompress(_zlib_stored(big)) == big

    p = encode_png(bytes(340), 17)
    for cut in (len(p) // 2, 10, 33, 40, len(p) - 1):
        with pytest.raises(ValueError):
            decode_png(p[:cut])
    bad = bytearray(p)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))

    # all five filter types vs an independent naive filterer
    rng = np.random.RandomState(7)
    w, h = 9, 5
    img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    out, prev = b"", np.zeros(w, np.int32)
    for r, ft in zip(range(h), (0, 1, 2, 3, 4)):
        line = img[r].astype(np.int32)
        f = np.zeros(w, np.int32)
        for i in range(w):
            a = int(line[i - 1]) if i >= 1 else 0
            b = int(prev[i])
            c = int(prev[i - 1]) if i >= 1 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                pth = a + b - c
                pa, pb, pc = abs(pth - a), abs(pth - b), abs(pth - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            f[i] = (line[i] - pred) % 256
        out += bytes([ft]) + bytes(f.astype(np.uint8))
        prev = line

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(out))
        + chunk(b"IEND", b"")
    )
    assert decode_png(payload).tobytes() == img.tobytes()
    assert _real_decode(p, "png").tobytes() == bytes(340)


def test_small_cell_suppress_generic_masks_and_complements(spark):
    """The reusable release gate must (a) NULL mask_cols alongside the
    count on suppressed cells, (b) run complementary suppression only
    in strata with EXACTLY ONE primary cell, and (c) pass released
    cells through unchanged — planted cells drive every branch."""
    from data_engineer_project_spark.operators.governance import (
        small_cell_suppress,
    )

    cells = spark.createDataFrame(
        [
            # stratum A: one primary (n=3) -> complementary kicks in on
            # the smallest unsuppressed cell (n=12, cell 'a1')
            ("A", "a1", 12, 1200),
            ("A", "a2", 20, 2000),
            ("A", "a3", 3, 300),
            # stratum B: two primaries -> NO complementary round
            ("B", "b1", 2, 200),
            ("B", "b2", 4, 400),
            ("B", "b3", 30, 3000),
            # stratum C: nothing suppressed
            ("C", "c1", 15, 1500),
        ],
        "stratum string, cell string, n long, cents long",
    )
    out = {
        (r.stratum, r.cell): r
        for r in small_cell_suppress(
            cells,
            k=11,
            stratum_cols=("stratum",),
            cell_cols=("cell",),
            mask_cols=("cents",),
        ).collect()
    }
    def trip(r):
        return (r.released_n, r.released_cents, r.suppressed, r.suppression)

    assert trip(out[("A", "a3")]) == (None, None, True, "primary")
    assert trip(out[("A", "a1")]) == (None, None, True, "complementary")
    assert trip(out[("A", "a2")]) == (20, 2000, False, None)
    assert trip(out[("B", "b1")]) == (None, None, True, "primary")
    assert trip(out[("B", "b2")]) == (None, None, True, "primary")
    assert trip(out[("B", "b3")]) == (30, 3000, False, None)
    assert trip(out[("C", "c1")]) == (15, 1500, False, None)


def test_sweep_stores_keep_latest_across_all_families(tmp_path, spark):
    """sweep_stores must apply ONE keep-latest contract to every
    artifact family: *_store fingerprint subdirs pruned per family,
    shingle* table dirs pruned whole, in-flight (young) entries and
    non-artifact dirs untouched."""
    import os
    import time

    from data_engineer_project_spark.operators.similarity import (
        sweep_stores,
    )

    wh = tmp_path / "warehouse"
    old = time.time() - 7200  # past the in-flight min-age guard
    # family 1: a *_store with 10 fingerprint entries (aged), keep=3
    store = wh / "centroid_store"
    for i in range(10):
        d = store / f"a2_n{i}"
        d.mkdir(parents=True)
        (d / "_SUCCESS").touch()
        os.utime(d, (old + i, old + i))
    # a young (in-flight) entry beyond keep must survive
    young = store / "a2_young"
    young.mkdir()
    # family 2: shingle tables, 5 aged
    for i in range(5):
        d = wh / f"shingle_corpus_{i}"
        d.mkdir(parents=True)
        os.utime(d, (old + i, old + i))
    # a non-artifact dir must never be touched
    keepme = wh / "some_table"
    keepme.mkdir()
    os.utime(keepme, (old, old))

    sweep_stores(spark=None, warehouse=str(wh), keep=3)

    left = sorted(p.name for p in store.iterdir())
    # 10 aged entries + 1 young: keep-3 sweeps the 8 oldest aged ones,
    # but the young entry always survives regardless of rank
    assert "a2_young" in left
    assert set(left) >= {"a2_n8", "a2_n9"}
    assert "a2_n0" not in left and "a2_n5" not in left
    shingles = sorted(p.name for p in wh.iterdir() if p.name.startswith("shingle"))
    assert shingles == ["shingle_corpus_2", "shingle_corpus_3", "shingle_corpus_4"]
    assert keepme.exists()


def test_png_decoder_bounds_hostile_inflate():
    """Untrusted PNG input must quarantine, never OOM an executor:
    a zip bomb (tiny IDAT inflating past the declared geometry), a
    giant declared geometry with a tiny payload (allocation bounded
    BEFORE inflating), and a short stream all raise ValueError."""
    import struct
    import zlib

    import pytest

    from data_engineer_project_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    # multi-block roundtrip stays exact under the bounded inflate
    big = bytes(i % 251 for i in range(120_000))
    assert decode_png(encode_png(big, 60)).tobytes() == big

    def png(w, h, payload):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            _PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(payload))
            + _png_chunk(b"IEND", b"")
        )

    with pytest.raises(ValueError, match="bomb"):
        decode_png(png(16, 4, b"\x00" * 1_000_000))
    with pytest.raises(ValueError, match="decode bound"):
        decode_png(png(60000, 60000, b"\x00" * 10))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(png(16, 4, b"\x00" * 20))


def test_d100_verdicts_match_python_bruteforce(spark):
    """The incremental ingest verdicts must agree with a from-scratch
    Python recomputation (exact md5 lookup + brute-force 3-shingle
    Jaccard vs EVERY corpus doc) on sf0.001 — independent of both
    engines' shared banding scheme, so a pair the bands MISS (recall
    bug invisible to the oracle) fails here."""
    import hashlib

    import pyarrow.parquet as pq

    from data_engineer_project_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    tb = pq.read_table(f"{sf}/documents.parquet").to_pydict()
    bucket = lambda i: int(
        hashlib.md5(str(i).encode()).hexdigest()[:2], 16
    ) % 100
    docs = dict(zip(tb["doc_id"], tb["text"]))
    inc = {i: t for i, t in docs.items() if bucket(i) >= 90}
    corp = {i: t for i, t in docs.items() if bucket(i) < 90}

    def sh(t):
        w = t.split(" ")
        return {" ".join(w[k : k + 3]) for k in range(len(w) - 2)}

    corp_fp: dict[str, int] = {}
    for i, t in sorted(corp.items()):
        corp_fp.setdefault(hashlib.md5(t.encode()).hexdigest(), i)
    corp_sh = {i: sh(t) for i, t in corp.items()}

    want = {}
    for i, t in sorted(inc.items()):
        fp = hashlib.md5(t.encode()).hexdigest()
        if fp in corp_fp:
            want[i] = ("exact_dup", corp_fp[fp], 1.0)
            continue
        s = sh(t)
        best = None
        for ci, cs in corp_sh.items():
            if not s or not cs:
                continue
            inter = len(s & cs)
            j = inter / (len(s) + len(cs) - inter)
            if j >= 0.5 and (best is None or (j, -ci) > (best[1], -best[0])):
                best = (ci, j)
        want[i] = (
            ("near_dup", best[0], best[1]) if best else ("novel", None, None)
        )

    got = {
        r.doc_id: (r.verdict, r.match_doc, r.jaccard)
        for r in QUERIES["d100_incremental_neardup_ingest"]
        .fn(spark, sf)
        .collect()
    }
    assert set(got) == set(want)
    for i, (v, m, j) in want.items():
        gv, gm, gj = got[i]
        assert gv == v and gm == m, (i, got[i], want[i])
        if j is None:
            assert gj is None
        else:
            assert abs(gj - j) < 1e-12
    # non-vacuity: the fixture batch exercises more than one verdict
    assert len({v for v, _, _ in want.values()}) >= 2


def test_skew_guard_carry_columns_through_grid(spark):
    """carry columns must ride through the salted GRID path unchanged
    and pair-complete (m11/m14/d13/m10 consume them for verification
    predicates) — a hot key forces the grid, payloads compared against
    the naive join."""
    import pyspark.sql.functions as F

    from data_engineer_project_spark.operators.dedup import (
        skew_guarded_self_pairs,
    )

    rows = [(i, "hot", i * 7 % 13) for i in range(120)]
    rows += [(500 + i, "cold", i) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, key string, payload long")
    got = sorted(
        (r.doc_a, r.doc_b, r.payload_a, r.payload_b)
        for r in skew_guarded_self_pairs(
            df, ["key"], "id", carry=("payload",), cap=25
        ).collect()
    )
    pay = {i: p for i, k, p in rows}
    groups = {"hot": [i for i, k, _ in rows if k == "hot"],
              "cold": [i for i, k, _ in rows if k == "cold"]}
    want = sorted(
        (a, b, pay[a], pay[b])
        for ids in groups.values()
        for x, a in enumerate(ids)
        for b in ids[x + 1 :]
    )
    assert got == want
