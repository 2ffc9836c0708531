"""Phase-level profiler for the heavy graph/dedup bench slots (r14
optimization round, guide §1: measure first).

Reproduces a slot's internal phases with explicit timing fences
(actions between phases) so the wall-clock can be attributed to
collapse / pairing / PR rounds / CC rounds / rollup instead of guessed
from the composed lazy plan. Timing fences change the plan (extra
materializations), so the phase SUM overshoots the slot's bench time;
the per-phase RATIOS are the signal.

Usage: python tools/profile_phases.py d89 [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineer_project_spark.operators import dedup as DD  # noqa: E402
from data_engineer_project_spark.operators import graph as GR  # noqa: E402
from data_engineer_project_spark.operators.cache import (  # noqa: E402
    release_all,
    tracked_persist,
)
from data_engineer_project_spark.queries import QUERIES  # noqa: E402
from data_engineer_project_spark.session import get_spark  # noqa: E402
from data_engineer_project_spark.sources.registry import load_tables  # noqa: E402

PHASES: dict[str, list[tuple[str, float]]] = {}


def timed(label: str, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    PHASES.setdefault(label, []).append(dt)
    print(f"    {label:38s} {dt:7.3f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_d89(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    reps = timed(
        "reps collapse (persist+count)",
        lambda: (
            lambda df: (df.count(), df)[1]
        )(
            tracked_persist(
                t.documents.groupBy(F.md5("text").alias("f"))
                .agg(
                    F.min("doc_id").alias("doc_id"),
                    F.min("text").alias("text"),
                    F.count(F.lit(1)).alias("wt"),
                )
                .select("doc_id", "text", "wt")
            )
        ),
    )
    sh = timed(
        "shingles (persist+count)",
        lambda: (lambda df: (df.count(), df)[1])(
            tracked_persist(DD.exploded_shingles(reps, "doc_id", "text").distinct())
        ),
    )
    sig = timed(
        "minhash signatures (persist+count)",
        lambda: (lambda df: (df.count(), df)[1])(
            tracked_persist(DD.minhash_signatures(sh, "doc_id", 8))
        ),
    )
    cand = timed(
        "band candidates (noop)",
        lambda: (lambda df: (noop(df), df)[1])(
            DD.band_candidates(sig, "doc_id", 8, 4)
        ),
    )
    pairs = timed(
        "exact jaccard verify (persist+count)",
        lambda: (lambda df: (df.count(), df)[1])(
            tracked_persist(
                DD.exact_jaccard(cand, sh, "doc_id")
                .filter(F.col("jaccard") >= 0.5)
                .select("doc_a", "doc_b")
            )
        ),
    )
    edges = timed(
        "edges union (persist+count)",
        lambda: (lambda df: (df.count(), df)[1])(
            tracked_persist(
                pairs.selectExpr("doc_a AS e_src", "doc_b AS e_dst").union(
                    pairs.selectExpr("doc_b AS e_src", "doc_a AS e_dst")
                )
            )
        ),
    )
    deg = edges.groupBy("e_src").agg(F.count(F.lit(1)).alias("deg"))
    nw = reps.select(F.col("doc_id").alias("node"), "wt")
    ranks = (
        edges.select(F.col("e_src").alias("node"))
        .distinct()
        .join(nw, "node")
        .select("node", (F.col("wt") * 1000000).cast("long").alias("r"))
    )
    for i in range(3):
        inflow = (
            edges.join(ranks, ranks.node == edges.e_src)
            .join(deg, "e_src")
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.expr("r div deg")).alias("inflow"))
        )
        ranks = inflow.join(nw, "node").select(
            "node",
            (F.col("wt") * 150000 + F.expr("(85 * inflow) div 100"))
            .cast("long")
            .alias("r"),
        )
    timed("3 PR rounds (noop, composed)", lambda: noop(ranks))
    comps = timed(
        "connected_components", lambda: GR.connected_components(pairs)
    )
    print(f"    CC rounds: {GR.LAST_RUN_STATS}")
    timed("final rollup (noop)", lambda: noop(comps.join(ranks, "node").join(nw, "node")))


def profile_m18(spark, sf_dir):
    from data_engineer_project_spark.operators.multimodal import (
        dhash_with_histogram,
    )

    t = load_tables(spark, sf_dir)
    reps = timed(
        "reps collapse (persist+count)",
        lambda: (lambda df: (df.count(), df)[1])(
            tracked_persist(
                t.documents.groupBy(F.md5("text").alias("f"))
                .agg(
                    F.min("doc_id").alias("doc_id"),
                    F.min("text").alias("text"),
                    F.count(F.lit(1)).alias("n_docs"),
                )
                .select("doc_id", "text", "n_docs")
            )
        ),
    )
    media = reps.select("doc_id", F.encode("text", "UTF-8").alias("media"))
    hh = timed(
        "dhash+hist Arrow pass (persist+count)",
        lambda: (lambda df: (df.count(), df)[1])(
            tracked_persist(
                dhash_with_histogram(media).select(
                    "doc_id", "phash", "hist", "n_bytes"
                )
            )
        ),
    )
    bands = hh.select(
        "doc_id",
        "phash",
        "hist",
        "n_bytes",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("bi"),
                        F.shiftright("phash", 16 * bi)
                        .bitwiseAND(F.lit(65535))
                        .alias("bk"),
                    )
                    for bi in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "phash", "hist", "n_bytes", "band.bi", "band.bk")
    l1 = F.aggregate(
        F.zip_with("hist_a", "hist_b", lambda a, b: F.abs(a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = timed(
        "band pair join + verify (persist+count)",
        lambda: (lambda df: (df.count(), df)[1])(
            tracked_persist(
                DD.skew_guarded_self_pairs(
                    bands,
                    ["bi", "bk"],
                    "doc_id",
                    carry=("phash", "hist", "n_bytes"),
                    consumer="m18_dhash_bands",
                )
                .filter(
                    F.bit_count(
                        F.col("phash_a").bitwiseXOR(F.col("phash_b"))
                    )
                    <= 3
                )
                .filter(l1 * 4 <= F.col("n_bytes_a") + F.col("n_bytes_b"))
                .select("doc_a", "doc_b")
                .distinct()
            )
        ),
    )
    comps = timed("connected_components", lambda: GR.connected_components(pairs))
    print(f"    CC rounds: {GR.LAST_RUN_STATS}")
    timed("final rollup (noop)", lambda: noop(comps.join(reps, comps.node == reps.doc_id)))


def profile_d101(spark, sf_dir):
    """Warm-path phases of the incremental cluster merge (r15): store
    reads, delta collapse, delta shingles, pairing (one-sided probe +
    delta self-pairs), the two verify joins, CC over star+delta edges,
    rollup. Assumes the standing store exists (run the d101 query once
    first, or via bench)."""
    import data_engineer_project_spark.queries.llm_pipeline as LP

    t = load_tables(spark, sf_dir)
    docs = t.documents
    split = 90
    bucket = F.expr(LP._SPARK_BUCKET)
    corpus = docs.filter(bucket < split).select("doc_id", "text")
    delta = docs.filter(bucket >= split).select("doc_id", "text")
    store = LP._neardup_cluster_store(corpus, split)
    paths = {n: store / p for n, p in
             [("reps", "reps"), ("comps", "comps"), ("sh", "shingles"),
              ("bands", "bands")]}
    if not all((p / "_SUCCESS").exists() for p in paths.values()):
        print("    store missing — run d101 once first"); return
    st = {n: spark.read.parquet(str(p)) for n, p in paths.items()}
    stored_reps, stored_comps, shc, bc = (
        st["reps"], st["comps"], st["sh"], st["bands"])

    dfp = timed(
        "delta collapse (persist+count)",
        lambda: (lambda df: (df.count(), df)[1])(
            tracked_persist(
                LP._collapse_reps(delta).select(
                    "fp", F.col("node").alias("d_doc"), "text",
                    F.col("wt").alias("wt_d"))
            )
        ),
    )
    rename = stored_reps.join(dfp.select("fp", "d_doc", "wt_d"), "fp").filter(
        F.col("d_doc") < F.col("node")).select(
        F.col("node").alias("_old"), F.col("d_doc").alias("_new"))
    novel = dfp.join(stored_reps.select("fp"), "fp", "left_anti").select(
        "fp", F.col("d_doc").alias("node"), "text",
        F.col("wt_d").alias("wt"))
    timed("rename map (noop)", lambda: noop(rename))
    shn = timed(
        "delta shingles shn (persist+count)",
        lambda: (lambda df: (df.count(), df)[1])(
            tracked_persist(
                DD.exploded_shingles(novel, id_col="node").distinct())
        ),
    )
    sign = DD.minhash_signatures(shn, id_col="node", num_hashes=8)
    bn = DD.band_key_rows(sign, id_col="node", num_hashes=8, bands=4)
    cand_dc = (
        bn.select(F.col("node").alias("doc_a"), "band", "key")
        .join(bc.select(F.col("node").alias("doc_b"), "band", "key"),
              ["band", "key"])
        .select("doc_a", "doc_b").distinct()
    )
    cand_dc = timed(
        "one-sided band probe cand_dc (persist+count)",
        lambda: (lambda df: (df.count(), df)[1])(tracked_persist(cand_dc)),
    )
    sh_all = shn.union(shc)
    e_dc = DD.exact_jaccard(cand_dc, sh_all, id_col="node").filter(
        F.col("jaccard") >= 0.5).select("doc_a", "doc_b")
    timed("delta-x-corpus verify e_dc (noop)", lambda: noop(e_dc))
    e_dd = DD.minhash_lsh_pairs_from_shingles(
        shn, id_col="node", num_hashes=8, jaccard_threshold=0.5
    ).select("doc_a", "doc_b")
    timed("delta-x-delta pairs e_dd (noop)", lambda: noop(e_dd))
    star = stored_comps.select(
        F.col("node").alias("doc_a"), F.col("component").alias("doc_b"))

    def ren(df, col):
        return (df.join(rename, df[col] == rename["_old"], "left")
                .withColumn(col, F.coalesce("_new", col))
                .drop("_old", "_new"))

    all_edges = (ren(ren(star, "doc_a"), "doc_b")
                 .union(ren(e_dc, "doc_b")).union(e_dd))
    comps = timed("connected_components",
                  lambda: GR.connected_components(all_edges))
    print(f"    CC rounds: {GR.LAST_RUN_STATS}")
    merged_reps = (
        stored_reps.join(dfp.select("fp", "d_doc", "wt_d"), "fp", "left")
        .select(
            "fp",
            F.least(F.col("node"), F.coalesce("d_doc", "node")).alias("node"),
            (F.col("wt") + F.coalesce("wt_d", F.lit(0))).alias("wt"),
            "n_tok",
        )
        .union(novel.select("fp", "node", "wt",
                            F.lit(0).cast("long").alias("n_tok")))
    )
    timed("weighted rollup (noop)",
          lambda: noop(LP._cluster_rollup(merged_reps, comps)))


PROFILERS = {"d89": profile_d89, "m18": profile_m18, "d101": profile_d101}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "d89"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # warm: JVM, codegen, python workers
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    import pandas as _pd  # noqa: F401

    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    full = QUERIES[
        {
            "d89": "d89_weighted_pagerank_canonical",
            "m18": "m18_image_neardup_verified",
            "d101": "d101_incremental_cluster_merge",
        }[name]
    ].fn
    for rep in range(2):
        t0 = time.time()
        full(spark, sf_dir).collect()
        release_all()
        print(f"full slot run {rep}: {time.time() - t0:.3f}s", flush=True)
    for rep in range(2):
        print(f"  phase rep {rep}:", flush=True)
        PROFILERS[name](spark, sf_dir)
        release_all()
    print("\nper-phase min:")
    for k, v in PHASES.items():
        print(f"  {k:40s} {min(v):7.3f}s")


if __name__ == "__main__":
    main()
