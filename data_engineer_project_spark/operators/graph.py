"""Connected components over a pair/edge list — the step that turns
near-duplicate PAIRS (MinHash-LSH / SimHash output) into duplicate
CLUSTERS with one canonical survivor each. Spark has no graph operator
in the DataFrame API; this is iterative min-label propagation built
from joins + aggregates (SURVEY custom-operator tier (a)).

Each iteration: every node takes the minimum label among itself and
its neighbors — one equi-join + one groupBy-min, both plain shuffles
on the node key. Convergence needs O(diameter) rounds; dedup cluster
graphs are near-cliques (diameter ≤ ~3), so this terminates in a few
rounds even at corpus scale. The driver-side loop only checks a scalar
convergence count per round; all data movement is distributed.
``localCheckpoint`` truncates the lineage each round so the plan does
not grow with iterations.

At web scale with adversarially long chains you would switch to the
large-star/small-star alternation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — same join/agg
primitives, fewer rounds; min-label propagation is the right default
for bounded-diameter dedup graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node that appears in ``pairs`` with the minimum node
    id of its connected component. Returns (node, component).

    Only nodes present in at least one edge are labeled (singletons
    trivially form their own component and are cheap to union back in
    if needed).
    """
    # The convergence probe sums labels as decimal; a non-numeric id
    # type would cast to NULL, make every checksum None, and stop the
    # loop after one round with wrong components. Enforce the contract
    # instead of silently mislabeling (string ids: map to dense ints
    # first, e.g. xxhash64 or a zipWithIndex-style dimension).
    for col in (src, dst):
        id_type = pairs.schema[col].dataType.typeName()
        if id_type not in ("byte", "short", "integer", "long", "decimal"):
            raise ValueError(
                f"connected_components requires integral node ids, got "
                f"{id_type} for {col!r}"
            )
    fwd = pairs.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    und = fwd.union(
        pairs.select(F.col(dst).alias("e_src"), F.col(src).alias("e_dst"))
    ).distinct().persist()

    labels = und.select(F.col("e_src").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    ).localCheckpoint()

    def _checksum(df: DataFrame) -> int:
        # exact decimal sum: labels only ever decrease, so the total is
        # strictly monotone until the fixpoint — a scalar convergence
        # probe with no extra join/shuffle
        return df.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    prev = _checksum(labels)
    for _ in range(max_iter):
        neighbor = und.join(labels, und.e_src == labels.node).select(
            F.col("e_dst").alias("node"), "comp"
        )
        labels = (
            labels.union(neighbor)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        cur = _checksum(labels)
        if cur == prev:
            break
        prev = cur

    und.unpersist()
    return labels.select("node", F.col("comp").alias("component"))
