"""Large-star/small-star connected components prototype (r15, VERDICT
r14 item 4) — A/B against the shipped min-label + pointer-jump loop on
the SAME edge sets, in one session, alternating reps.

The shipped loop (operators/graph.py) shuffles only node-sized label
tables per round (the edge set is partitioned once, up front); its
round count is O(log diameter) via pointer jumping. The Kiveris et al.
(SoCC'14) large-star/small-star alternation converges in fewer
ALTERNATIONS on chain-heavy graphs but rewrites the EDGE set every
phase (two edge-sized groupBy+re-emit shuffles per alternation).
Which wins depends on whether per-round edge work or round count
dominates — exactly the question r14's rejected 2-hop/3-hop variants
answered "round count does NOT dominate" for. This prototype measures
the remaining unexplored point on that curve.

Graphs: (a) the real d99 near-dup pair set at the given SF (built
once, persisted, excluded from timing), (b) a synthetic chain-heavy
graph (200 chains x 50 nodes — diameter 50, the shape pointer jumping
exists for), (c) a synthetic star/clique mixture.

Correctness: both implementations must return the identical
(node, component) set on every graph (asserted), so a win here could
be adopted into operators/graph.py without semantic risk.

Usage: python tools/cc_star_prototype.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_engineer_project_spark.operators import graph as GR  # noqa: E402
from data_engineer_project_spark.session import get_spark  # noqa: E402

STAR_LAST_STATS: dict = {}


def connected_components_star(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 20
) -> DataFrame:
    """Kiveris large-star/small-star alternation over a pair list.
    Returns (node, component) for every node in at least one edge —
    the same contract as GR.connected_components."""
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .persist()
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def checksum(e: DataFrame) -> tuple:
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
            F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
        ).collect()[0]
        return (r["n"], r["su"], r["sv"])

    def large_star(e: DataFrame) -> DataFrame:
        und = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # per node u: m = min(N(u) + {u}); emit (v, m) for v > u
        grp = und.groupBy("u").agg(
            F.min("v").alias("mv"), F.collect_set("v").alias("nbrs")
        ).select("u", F.least("mv", "u").alias("m"), "nbrs")
        return (
            grp.select("u", "m", F.explode("nbrs").alias("v"))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # key every edge on its LARGER endpoint
        keyed = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        grp = keyed.groupBy("u").agg(
            F.min("v").alias("m"), F.collect_set("v").alias("nbrs")
        )
        out = grp.select("u", "m", F.explode("nbrs").alias("v")).select(
            F.when(F.col("v") != F.col("m"), F.col("v")).otherwise(F.col("u")).alias("u"),
            F.col("m").alias("v"),
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    e = edges
    rounds = 0
    prev = None
    for _ in range(max_iter):
        rounds += 1
        e = large_star(e).localCheckpoint(eager=True)
        e = small_star(e).localCheckpoint(eager=True)
        cur = checksum(e)
        if cur == prev:
            break
        prev = cur
    STAR_LAST_STATS.clear()
    STAR_LAST_STATS.update({"rounds": rounds})
    # at the fixpoint, e is a set of star edges (v -> root). Labels:
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    return (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("comp", "node").alias("component"))
    )


def build_graphs(spark, sf_dir):
    out = {}
    # (a) real d99 pair set
    from data_engineer_project_spark.operators import dedup as DD
    from data_engineer_project_spark.operators.cache import release_all
    from data_engineer_project_spark.sources.registry import load_tables

    t = load_tables(spark, sf_dir)
    reps = (
        t.documents.groupBy(F.md5("text").alias("f"))
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .select("doc_id", "text")
    )
    pairs = (
        DD.minhash_lsh_pairs(reps, num_hashes=8, bands=4, jaccard_threshold=0.5)
        .select("doc_a", "doc_b")
        .persist()
    )
    pairs.count()
    release_all()
    out["d99_pairs"] = pairs
    # (b) chain-heavy synthetic: 200 chains x 50 nodes
    chain = spark.range(200 * 49).selectExpr(
        "cast(id / 49 as long) * 50 + (id % 49) as doc_a",
        "cast(id / 49 as long) * 50 + (id % 49) + 1 as doc_b",
    ).persist()
    chain.count()
    out["chains_200x50"] = chain
    # (c) star/clique mixture: 500 stars of 40 + random intra-group pairs
    stars = spark.range(500 * 39).selectExpr(
        "100000 + cast(id / 39 as long) * 40 as doc_a",
        "100000 + cast(id / 39 as long) * 40 + (id % 39) + 1 as doc_b",
    ).persist()
    stars.count()
    out["stars_500x40"] = stars
    return out


def labels_fingerprint(df: DataFrame):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("node").cast("decimal(38,0)")).alias("sn"),
        F.sum(F.col("component").cast("decimal(38,0)")).alias("sc"),
        F.countDistinct("component").alias("k"),
    ).collect()[0]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(
        "cc-star-proto", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    graphs = build_graphs(spark, sf_dir)
    for name, pairs in graphs.items():
        print(f"== {name}: {pairs.count()} edges")
        # correctness cross-check once
        ref = labels_fingerprint(GR.connected_components(pairs))
        got = labels_fingerprint(connected_components_star(pairs))
        ok = tuple(ref) == tuple(got)
        print(f"   parity {'OK' if ok else 'MISMATCH'} ref={tuple(ref)} star={tuple(got)}")
        for i in range(reps):
            t0 = time.time()
            GR.connected_components(pairs).agg(
                F.sum("component")
            ).collect()
            dt_base = time.time() - t0
            base_rounds = GR.LAST_RUN_STATS.get("rounds")
            t0 = time.time()
            connected_components_star(pairs).agg(F.sum("component")).collect()
            dt_star = time.time() - t0
            print(
                f"   rep {i}: baseline {dt_base:6.3f}s ({base_rounds} rounds)"
                f"  star {dt_star:6.3f}s ({STAR_LAST_STATS.get('rounds')} alts)",
                flush=True,
            )


if __name__ == "__main__":
    main()
