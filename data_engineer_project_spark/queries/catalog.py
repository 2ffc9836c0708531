"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs a PySpark DataFrame implementation with a DuckDB-
runnable ANSI-SQL oracle string over the same tables. The driver (and
our own tests) run both and compare row-count + schema + order-
insensitive value hash, so implementations must:

- alias every computed column identically in both forms;
- do money/measure arithmetic in DECIMAL (exact, order-independent)
  and cast final non-integer numerics to DOUBLE — this makes results
  bit-identical between Spark and DuckDB regardless of partitioning
  or aggregation order;
- make any LIMIT/top-k deterministic with unique tie-breaker sort keys.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from data_engineer_project_spark.session import normalize_session
from data_engineer_project_spark.sources.registry import load_tables


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Scale tier (round-10, machine-readable form of the adjudicated
    # docstring caveats): "production" contracts are corpus-linear /
    # bounded-output and safe to run at 100 TB; "diagnostic" contracts
    # are output-quadratic in duplicate multiplicity BY CONTRACT (raw
    # pair/cluster enumerations kept for auditability) and must name
    # the production twin a user should run instead at scale.
    tier: str = "production"
    production_twin: str | None = None


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    tier: str = "production",
    production_twin: str | None = None,
):  # decorator
    """Register ``fn(t) -> DataFrame`` under ``name`` with its SQL twin.

    The wrapped function receives a ``Tables`` accessor; session
    normalization (UTC timezone etc.) is applied here so behavior does
    not depend on who constructed the SparkSession.

    ``tier="diagnostic"`` marks an output-quadratic audit contract and
    requires ``production_twin`` to name the scale-safe default.
    """

    def deco(fn):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            normalize_session(spark)
            return fn(load_tables(spark, sf_dir))

        runner.__name__ = name
        runner.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        if tier not in ("production", "diagnostic"):
            raise ValueError(f"unknown tier {tier!r} for {name!r}")
        if tier == "diagnostic" and not production_twin:
            raise ValueError(f"diagnostic query {name!r} must name its production twin")
        QUERIES[name] = QuerySpec(
            name, runner, oracle, fn.__doc__ or "", tuple(tags), tier, production_twin
        )
        return fn

    return deco
