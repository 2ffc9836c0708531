"""Distributed exact linear algebra over embedding columns.

The covariance / Gram matrix of a quantized embedding corpus is the
preprocessing step for PCA whitening, OPQ rotation, and spherical
k-means seeding (the IVF path in ``operators/similarity.py``). The
naive declarative form — posexplode twice and groupBy (i, j) — shuffles
N·d² rows; the scale-right form computes a PARTIAL d×d Gram per Arrow
batch with one integer matmul (q.T @ q) and ships only d²-sized
partials to a single tiny aggregation, so the corpus is scanned ONCE
and the shuffle volume is O(partitions · d²), independent of N.

Exactness: vectors are int8-quantized with the same symmetric max-abs
rule as d28 (q = floor(127·x/maxabs + 0.5), identical IEEE double ops
in numpy, Spark SQL, and DuckDB), after which every Gram entry and
column sum is INTEGER — partial sums commute, so the result is
bit-identical regardless of partitioning, and a SQL oracle can verify
it hash-exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineer_project_spark.operators import plancap

from data_engineer_project_spark.operators.cache import tracked_persist

# one row per upper-triangle Gram cell (j >= i) plus, per batch, the
# quantized column sums encoded as j = -1 rows — both from ONE scan
_PARTIAL_SCHEMA = "i int, j int, val long, n long"


def quantized_gram_partials(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-Arrow-batch partial Gram of int8-quantized vectors.

    Returns rows (i, j, val, n): for j >= i, ``val`` is the batch's
    Σ q_i·q_j and ``n`` its vector count; rows with j = -1 carry the
    batch's quantized column sums Σ q_i (needed to turn the Gram into
    a covariance without a second corpus scan). Sum ``val``/``n``
    over batches per (i, j) to get the exact corpus totals.
    """

    id_col = "vec_id"

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        expect_d: int | None = None
        for pdf in batches:
            keep = [
                (rid, v)
                for rid, v in zip(
                    pdf[id_col] if id_col in pdf.columns else pdf.index,
                    pdf[vec_col],
                )
                if v is not None and len(v) > 0
            ]
            if not keep:
                continue
            # A ragged corpus must fail LOUDLY with the offending ids:
            # np.stack's own error names nothing, and dimension drift
            # ACROSS batches would silently produce per-cell n_vectors
            # that differ by Gram cell (each batch only contributes the
            # cells its width has) — a corrupted covariance, not a
            # crash. Pin every batch to the first-seen dimension.
            dims = {len(v) for _, v in keep}
            if expect_d is not None:
                dims.add(expect_d)
            if len(dims) > 1:
                offenders = [
                    (rid, len(v)) for rid, v in keep if len(v) != min(dims)
                ][:5]
                raise ValueError(
                    f"quantized_gram_partials: inconsistent embedding "
                    f"dimensions {sorted(dims)} in column {vec_col!r}; "
                    f"first offenders (id, dim): {offenders}"
                )
            expect_d = dims.pop()
            x = np.stack([np.asarray(v, dtype=np.float64) for _, v in keep])
            maxabs = np.abs(x).max(axis=1, keepdims=True)
            # all-zero vectors quantize to q = 0 (dividing would make
            # 0/0 = NaN, and numpy's NaN→int64 cast is garbage, not an
            # error); the SQL twin mirrors this with a CASE guard
            scaled = np.divide(
                127.0 * x,
                maxabs,
                out=np.zeros_like(x),
                where=maxabs > 0,
            )
            q = np.floor(scaled + 0.5).astype(np.int64)
            n, d = q.shape
            g = q.T @ q  # exact int64: |cell| <= n · 127²
            iu, ju = np.triu_indices(d)
            s = q.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(d)]).astype(np.int32),
                    "j": np.concatenate(
                        [ju, np.full(d, -1)]
                    ).astype(np.int32),
                    "val": np.concatenate([g[iu, ju], s]),
                    "n": np.full(iu.size + d, n, dtype=np.int64),
                }
            )

    return emb.mapInPandas(stage, _PARTIAL_SCHEMA)


def quantized_covariance(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact Gram + covariance of the int8-quantized corpus.

    Returns (dim_i, dim_j, gram, n_vectors, cov) for j >= i, where
    cov = (n·G_ij − S_i·S_j) / n² folds the integer numerator in
    DECIMAL(38,0) (n·G alone overflows int64 near 10⁹ vectors) and
    divides once — bit-identical on any engine.
    """
    parts = quantized_gram_partials(emb, vec_col)
    # Persist the d²-sized aggregate: four plan consumers fork off it
    # (n_max guard, Gram cells, and both column-sum sides), and without
    # a persist each fork re-executes the full mapInPandas corpus scan.
    # The cached frame is tiny (d² + d rows) — the expensive Gram
    # partials compute exactly once per action.
    tot = tracked_persist(
        parts.groupBy("i", "j").agg(
            F.sum("val").alias("val"), F.sum("n").alias("n")
        )
    )
    # Cross-batch dimension drift is invisible to the per-batch guard
    # when each task happens to see only same-width vectors (e.g. the
    # drifted rows live in their own partitions): every batch then
    # contributes only the cells its width has, and per-cell n_vectors
    # silently diverge — a corrupted covariance, not a crash. With a
    # consistent dimension EVERY cell aggregates every batch, so all n
    # are equal; enforce that invariant JVM-side and fail loud. The
    # assert lives in a filter so column pruning can't drop it; with
    # ``tot`` persisted above, the guard subquery reads the cached
    # d²-row aggregate (one 1-row broadcast), not a fresh corpus scan.
    n_max = tot.agg(F.max("n").alias("__n_max"))
    tot = (
        tot.crossJoin(F.broadcast(n_max))
        .filter(
            F.assert_true(
                F.col("n") == F.col("__n_max"),
                F.lit(
                    "quantized_covariance: embedding dimension drift across "
                    "batches — Gram cells were contributed by differing "
                    f"vector counts; check {vec_col!r} for ragged dimensions"
                ),
            ).isNull()
        )
        .drop("__n_max")
    )
    g = tot.filter(F.col("j") >= 0)
    s = tot.filter(F.col("j") == -1).select(
        F.col("i").alias("k"), F.col("val").alias("s")
    )
    sa = s.select(F.col("k").alias("i"), F.col("s").alias("s_i"))
    sb = s.select(F.col("k").alias("j"), F.col("s").alias("s_j"))
    j = g.join(F.broadcast(sa), "i").join(F.broadcast(sb), "j")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = dec("n") * dec("val") - dec("s_i") * dec("s_j")
    return j.select(
        F.col("i").alias("dim_i"),
        F.col("j").alias("dim_j"),
        F.col("val").alias("gram"),
        F.col("n").alias("n_vectors"),
        (num.cast("double") / (dec("n") * dec("n")).cast("double")).alias(
            "cov"
        ),
    )


def quantize_embeddings(
    emb: DataFrame,
    quant: float = 1024.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pos, qv): the vector table exploded to 1-based coordinates
    quantized as floor(x * quant) — exact int64, so downstream sums
    are aggregation-order-free (the kmeans_centroids playbook)."""
    return emb.select(
        F.col(id_col).alias("vec_id"), F.posexplode(vec_col).alias("p0", "x")
    ).select(
        "vec_id",
        (F.col("p0") + 1).alias("pos"),
        F.floor(F.col("x").cast("double") * F.lit(float(quant)))
        .cast("long")
        .alias("qv"),
    )


def dense_dot(qv, direction: list[int]):
    """Exact int64 dot of an array<long> column with a Python integer
    direction, as a zip_with/aggregate fold over ONE array literal —
    the codegen-stable form (a complex-type literal becomes a
    reference object in generated code, so re-invoking with a new
    direction reuses the compiled stage)."""
    return F.aggregate(
        F.zip_with(qv, F.lit([int(x) for x in direction]), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_vectors(
    emb: DataFrame,
    quant: float = 1024.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, qv array<long>): the ARRAY form of
    ``quantize_embeddings`` — same per-element floor(x * quant)
    quantization, kept as one row per vector so the dense
    power-iteration path can run shuffle-free (see
    ``power_iteration_dense``)."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(quant))).cast(
                "long"
            ),
        ).alias("qv"),
    )


def power_iteration_dense(
    qa: DataFrame,
    rounds: int = 3,
    vscale: float = 128.0,
) -> tuple[dict[int, int], list[tuple[int, int]]]:
    """Power iteration on the ARRAY-form quantized corpus ``qa``
    (vec_id, qv array<long>) — the one-job-per-round shape (r14,
    guide §2.4): the direction enters the plan as ONE array literal
    (codegen renders complex-type literals as reference objects, so
    the generated code — and the compiled-class cache hit — is
    identical every round), each row computes its own s_i = q_i · v
    as an integer zip_with fold, and y = Σ_i q_i s_i is a posexplode
    + d-group aggregate whose partial agg reduces each task to ≤ d
    rows before the (tiny) exchange. Per round: one job, one scan of
    the cached corpus, zero joins, zero driver createDataFrame
    round-trips (the exploded form paid two join+groupBy passes and
    a py4j direction upload per round). A/B note: inlining the
    direction as d SCALAR literals instead recompiles the stage per
    round (integer literals embed in the source) and a d-column
    total aggregate compiles a pathological agg class — both
    measured slower than this shape. Every sum is exact int64, so v
    and the Rayleigh ingredients are BIT-IDENTICAL to
    :func:`power_iteration` — pinned by test.

    Same contract otherwise: returns (direction {pos: int},
    [(num_k, vv_k)] per round), raises on int64-headroom exhaustion
    and on a vanished y. ``qa`` should be persisted by the caller."""
    import math

    setup = qa.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size("qv")).alias("dmin"),
        F.max(F.size("qv")).alias("dmax"),
        F.max(F.array_max(F.transform(F.col("qv"), F.abs))).alias("maxq"),
    ).first()
    n = setup["n"]
    if not n:
        raise ValueError(
            "power_iteration: empty corpus has no principal direction"
        )
    if setup["dmin"] != setup["dmax"]:
        raise ValueError(
            "power_iteration_dense: ragged embedding dimensions "
            f"({setup['dmin']} .. {setup['dmax']})"
        )
    d = setup["dmax"]
    maxq = setup["maxq"] or 0
    if float(n) * maxq * d * maxq * vscale >= 2.0 ** 62:
        raise ValueError(
            f"power_iteration int64 headroom exhausted a priori"
            f" (n={n}, max|q|={maxq}, d={d}):"
            " lower the embedding quantization for this corpus size"
        )
    dims = list(range(1, d + 1))
    v = {p: int(vscale) for p in dims}
    stats: list[tuple[int, int]] = []
    for _ in range(rounds):
        s_expr = dense_dot(F.col("qv"), [v[p] for p in dims])
        ydf = (
            qa.select("qv", s_expr.alias("__s"))
            .select(
                F.posexplode(
                    F.transform(F.col("qv"), lambda x: x * F.col("__s"))
                ).alias("p0", "contrib")
            )
            .groupBy("p0")
            .agg(F.sum("contrib").alias("y"))
        )
        if not stats:
            # plan-audit hook: one representative round (array-literal
            # direction fold + explode/d-group agg — no join)
            plancap.grab("power-iteration round", ydf)
        rows = {r["p0"] + 1: r["y"] for r in ydf.collect()}
        if sum(abs(x) for x in rows.values()) * vscale >= 2.0 ** 62:
            raise ValueError(
                "power_iteration int64 headroom exhausted on sum(y*v):"
                " lower the embedding quantization for this corpus size"
            )
        num = sum(rows[p] * v[p] for p in rows)
        vv = sum(x * x for x in v.values())
        stats.append((num, vv))
        m = float(max(abs(x) for x in rows.values()))
        if m == 0.0:
            raise ValueError(
                "power_iteration: y vanished (all quantized"
                " coordinates are zero or the direction lies in the"
                " null space); the corpus has no principal direction"
                " at this quantization"
            )
        v = {
            p: math.floor(float(rows[p]) * float(vscale) / m + 0.5)
            for p in rows
        }
    return v, stats


def power_iteration(
    q: DataFrame,
    rounds: int = 3,
    vscale: float = 128.0,
) -> tuple[dict[int, int], list[tuple[int, int]]]:
    """Matrix-free power iteration on the second-moment matrix of the
    quantized coordinate table ``q`` (vec_id, pos, qv): per round
    s_i = q_i . v (one vector-keyed shuffle), y = sum_i q_i s_i (one
    coordinate-keyed shuffle), then the direction rescales to
    max|v| = vscale via FLOOR(y * vscale / max|y| + 0.5) — evaluated
    here in driver Python on exact integer inputs with the same IEEE
    double semantics the SQL oracle twin uses, so both derive
    identical integer directions.

    Returns (final direction {pos: int}, [(num_k, vv_k)] per round)
    where num_k = v_{k-1}' y_k and vv_k = |v_{k-1}|^2 are the EXACT
    integer Rayleigh-quotient ingredients (divide by n outside).
    Power iteration on a PSD matrix increases the Rayleigh quotient
    monotonically; the convergence RATE is the eigengap lambda2/
    lambda1 — near-isotropic corpora converge slowly by nature, which
    is a property of the data, not the operator (pinned both ways in
    tests: monotone on the corpus, 3-round recovery on a planted
    spike).

    Scale shape: the quantized corpus should be persisted by the
    caller; each round broadcasts the <= dim-row direction against a
    linear scan. Driver state is the direction and max|y| — bounded
    by dim, never by n."""
    import math

    dims = [r["pos"] for r in q.select("pos").distinct().collect()]
    # A-priori y guard: y_j = sum_i q_ij s_i can wrap BEFORE any value
    # reaches the driver, so bound it from (n, max|q|, d, vscale)
    # before the first round — refusing is correct at corpus sizes
    # where this quantization loses exactness (re-quantize coarser).
    d = len(dims)
    # n must count VECTORS, not rows/d: ragged or sparse coordinate
    # tables (missing (vec_id, pos) cells) would understate n and
    # weaken the headroom guard below.
    n = q.select(F.countDistinct("vec_id")).collect()[0][0]
    maxq = q.agg(F.max(F.abs("qv"))).collect()[0][0] or 0
    if float(n) * maxq * d * maxq * vscale >= 2.0 ** 62:
        raise ValueError(
            f"power_iteration int64 headroom exhausted a priori"
            f" (n={n}, max|q|={maxq}, d={d}):"
            " lower the embedding quantization for this corpus size"
        )
    v = {p: int(vscale) for p in dims}
    spark = q.sparkSession
    stats: list[tuple[int, int]] = []
    for _ in range(rounds):
        vdir = spark.createDataFrame(
            [(p, v[p]) for p in sorted(v)], "pos int, v long"
        )
        s = (
            q.join(F.broadcast(vdir), "pos")
            .groupBy("vec_id")
            .agg(F.sum(F.col("qv") * F.col("v")).alias("s"))
        )
        y = (
            q.join(s, "vec_id")
            .groupBy("pos")
            .agg(F.sum(F.col("qv") * F.col("s")).alias("y"))
        )
        if not stats:
            # plan-audit hook: one representative iteration (broadcast
            # direction dot-product + coordinate-keyed refold)
            plancap.grab("power-iteration round", y)
        rows = {r["pos"]: r["y"] for r in y.collect()}
        # Realized overflow guard for the Rayleigh ingredient
        # num = sum(y*v) with |v| <= vscale (both the PREVIOUS v used
        # this round and the rescaled next one satisfy the bound):
        # Spark wraps int64 silently outside ANSI mode, so fail loudly
        # on the collected bounded state (the d51 precedent).
        if sum(abs(x) for x in rows.values()) * vscale >= 2.0 ** 62:
            raise ValueError(
                "power_iteration int64 headroom exhausted on sum(y*v):"
                " lower the embedding quantization for this corpus size"
            )
        num = sum(rows[p] * v[p] for p in rows)
        vv = sum(x * x for x in v.values())
        stats.append((num, vv))
        m = float(max(abs(x) for x in rows.values()))
        if m == 0.0:
            # All-zero y means every quantized coordinate is zero (or
            # the direction is exactly in the null space): rescaling
            # would divide by zero. Degenerate corpus, not a bug here.
            raise ValueError(
                "power_iteration: y vanished (all quantized"
                " coordinates are zero or the direction lies in the"
                " null space); the corpus has no principal direction"
                " at this quantization"
            )
        v = {
            p: math.floor(float(rows[p]) * float(vscale) / m + 0.5)
            for p in rows
        }
    return v, stats
