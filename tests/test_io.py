"""Typed I/O surface: CSV/JSON readers honor declared schemas (no
inference), the partitioned parquet sink prunes partitions on read,
and dynamic overwrite only replaces the partitions being reloaded."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from data_engineer_project_spark.sources import io as sio

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("d", DateType()),
    ]
)


def test_csv_roundtrip_declared_schema(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("id,name,d\n1,ava,2025-01-03\n2,ben,2025-02-07\n")
    df = sio.read_csv(spark, p, SCHEMA)
    assert df.schema == SCHEMA
    assert df.orderBy("id").collect()[0].name == "ava"


def test_json_reader_declared_schema(spark, tmp_path):
    p = str(tmp_path / "t.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "ava", "d": "2025-01-03"}\n')
        f.write('{"id": 2, "name": "ben", "d": "2025-02-07"}\n')
    df = sio.read_json(spark, p, SCHEMA)
    assert df.schema == SCHEMA
    assert df.count() == 2


def test_partitioned_sink_prunes_on_read(spark, tmp_path):
    from data_engineer_project_spark.sources.registry import load_tables

    orders = load_tables(spark, "/root/testdata/sf0.001").orders
    out = str(tmp_path / "orders_by_year")
    with_year = orders.withColumn("o_year", F.year("o_orderdate"))
    sio.write_partitioned_parquet(with_year, out, ["o_year"])

    back = sio.read_partitioned_parquet(spark, out).filter(F.col("o_year") == 1995)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:120]
    want = orders.filter(F.year("o_orderdate") == 1995).count()
    assert back.count() == want > 0


def test_dynamic_overwrite_replaces_only_loaded_partitions(spark, tmp_path):
    from data_engineer_project_spark.sources.registry import load_tables

    orders = load_tables(spark, "/root/testdata/sf0.001").orders.withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "dyn")
    sio.write_partitioned_parquet(orders, out, ["o_year"])
    total = sio.read_partitioned_parquet(spark, out).count()

    # reload ONE year with a marker change; other years must survive
    one_year = orders.filter(F.col("o_year") == 1995).withColumn(
        "o_comment", F.lit("reloaded")
    )
    sio.write_partitioned_parquet(one_year, out, ["o_year"])
    back = sio.read_partitioned_parquet(spark, out)
    assert back.count() == total
    assert back.filter((F.col("o_year") == 1995) & (F.col("o_comment") != "reloaded")).count() == 0
    assert back.filter(F.col("o_comment") == "reloaded").count() == one_year.count()


def test_sql_surface_over_registered_views(spark, sf_dir):
    """SURVEY EP3: the ad-hoc SQL entry point — register the testdata
    as views, type SQL, get Catalyst's full parse→optimize→execute
    pipeline. The SQL text result must equal the DataFrame-API result
    of the same query."""
    from pyspark.sql import functions as F

    from data_engineer_project_spark.sources.registry import load_tables, register_views

    register_views(spark, sf_dir)
    got = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
        """
    ).collect()
    t = load_tables(spark, sf_dir)
    want = (
        t.customer.join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name")
        .collect()
    )
    assert got == want


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """Small-files compaction: 64 tiny files -> 1 (data is ~KBs, far
    under target_mb), identical rows, and the dataset is readable at
    every point (swap via temp dir)."""
    from data_engineer_project_spark.sources.io import compact_parquet

    path = str(tmp_path / "sprawl")
    spark.range(10_000).selectExpr("id", "id % 7 AS g").repartition(64).write.parquet(path)
    import os as _os

    before = len([f for f in _os.listdir(path) if f.endswith(".parquet")])
    assert before == 64
    want = spark.read.parquet(path).groupBy("g").count().collect()

    n_after = compact_parquet(spark, path, target_mb=128)
    assert n_after < before
    got = spark.read.parquet(path).groupBy("g").count().collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_compact_parquet_refuses_partitioned_root(spark, tmp_path):
    """A flat rewrite of a Hive-partitioned dataset would silently
    demote partition directories to columns — must refuse."""
    import pytest as _pytest

    from data_engineer_project_spark.sources.io import compact_parquet

    path = str(tmp_path / "parted")
    spark.range(100).selectExpr("id", "id % 3 AS g").write.partitionBy("g").parquet(path)
    with _pytest.raises(ValueError, match="Hive-partitioned"):
        compact_parquet(spark, path)


def test_compact_parquet_restores_dataset_if_swap_fails(spark, tmp_path, monkeypatch):
    """If the second move of the swap dies, the dataset must be restored
    at `path` (never stranded in ._compact_old)."""
    import shutil as _shutil

    from data_engineer_project_spark.sources.io import compact_parquet

    path = str(tmp_path / "swapfail")
    spark.range(1_000).selectExpr("id", "id % 5 AS g").repartition(8).write.parquet(path)
    want = spark.read.parquet(path).count()

    real_move = _shutil.move

    def exploding_move(src, dst, *a, **kw):
        if str(src).endswith("._compact_tmp"):
            raise OSError("simulated crash mid-swap")
        return real_move(src, dst, *a, **kw)

    monkeypatch.setattr(_shutil, "move", exploding_move)
    import pytest as _pytest

    with _pytest.raises(OSError, match="simulated"):
        compact_parquet(spark, path)
    monkeypatch.undo()
    assert spark.read.parquet(path).count() == want


def test_compact_parquet_refuses_nanos_as_long_columns(spark, tmp_path):
    """Under the session nanosAsLong contract a TIMESTAMP(NANOS) column
    reads as BIGINT; a compaction rewrite would persist that demotion.
    Must refuse."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.parquet as _pq
    import pytest as _pytest

    from data_engineer_project_spark.sources.io import compact_parquet

    path = tmp_path / "nanos"
    path.mkdir()
    table = _pa.table(
        {
            "id": _pa.array([1, 2, 3], type=_pa.int64()),
            "ts": _pa.array(
                _np.array([1, 2, 3], dtype="datetime64[ns]"),
                type=_pa.timestamp("ns"),
            ),
        }
    )
    _pq.write_table(table, str(path / "part-0.parquet"), version="2.6")
    # confirm the contract actually bites: ts reads back as BIGINT
    assert dict(spark.read.parquet(str(path)).dtypes)["ts"] == "bigint"
    with _pytest.raises(ValueError, match="TIMESTAMP\\(NANOS\\)"):
        compact_parquet(spark, str(path))


def test_write_sorted_parquet_clusters_row_group_stats(spark, tmp_path):
    """The sorted layout must produce parquet files whose row-group
    min/max ranges on the sort key are disjoint across the dataset —
    that's the property data-skipping depends on. Verify straight from
    the footers, and confirm a selective filter prunes files at plan
    level (PushedFilters + fewer files read than a random layout)."""
    import os as _os

    import pyarrow.parquet as _pq

    from data_engineer_project_spark.sources.io import write_sorted_parquet

    df = spark.range(100_000).selectExpr(
        "pmod(hash(id), 1000) AS k", "id AS payload"
    )
    path = str(tmp_path / "clustered")
    write_sorted_parquet(df, path, ["k"], n_files=8)

    ranges = []
    for f in sorted(_os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = _pq.ParquetFile(_os.path.join(path, f)).metadata
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            ranges.append((col.statistics.min, col.statistics.max))
    assert len(ranges) >= 8
    # globally disjoint (allowing equal boundary values at file edges):
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)

    # A 1-in-1000 key filter must read back exactly the matching rows
    # with the predicate pushed to the scan.
    got = spark.read.parquet(path).filter("k = 7")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "k" in plan
    want = df.filter("k = 7").count()
    assert got.count() == want


def test_zorder_write_narrows_row_group_ranges_on_both_columns(spark, tmp_path):
    """Z-ordered layout: every file's min/max range must be narrow on
    BOTH dimensions (single-column sort can only narrow one), so a
    selective predicate on either column can skip most files."""
    import os as _os

    import pyarrow.parquet as _pq

    from data_engineer_project_spark.sources.io import write_zordered_parquet

    df = spark.range(64_000).selectExpr(
        "pmod(hash(id), 1000) AS x", "pmod(hash(id * 7 + 3), 1000) AS y"
    )
    path = str(tmp_path / "zordered")
    write_zordered_parquet(df, path, ["x", "y"], n_files=16)

    spans = {"x": [], "y": []}
    files = [f for f in sorted(_os.listdir(path)) if f.endswith(".parquet")]
    assert len(files) == 16
    for f in files:
        md = _pq.ParquetFile(_os.path.join(path, f)).metadata
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema in spans:
                    st = col.statistics
                    spans[col.path_in_schema].append(st.max - st.min)
    domain = 1000.0
    for c in ("x", "y"):
        avg_span = sum(spans[c]) / len(spans[c])
        # 16 z-cells ≈ 4×4 grid → ~25% per dimension; allow slack for
        # boundary-straddling segments but far below the ~100% a
        # random or single-column-sorted-on-the-OTHER-column layout has
        assert avg_span < 0.55 * domain, (c, avg_span)

    # schema round-trips without the helper key and rows survive
    back = spark.read.parquet(path)
    assert back.columns == ["x", "y"]
    assert back.count() == 64_000


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC round-trips losslessly and predicate pushdown reaches the
    ORC scan (search pushed filters in the physical plan) — the same
    data-skipping contract the parquet paths are held to."""
    from pyspark.sql import functions as F

    from data_engineer_project_spark.sources.io import read_orc, write_orc

    src = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 2.5).alias("v")
    )
    path = str(tmp_path / "t.orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.count() == 1000
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = (
        back.filter(F.col("k") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "k" in plan.split("PushedFilters")[1][:120]


def test_zorder_key_plan_is_narrow_no_window_no_shuffle(spark):
    """Round-6 scale fix pin: zorder_key must never funnel the table
    through a single-partition window (the old ntile form did). The
    keyed plan is scan -> Arrow-batched rank lookup -> project: no
    Window, no Sort, no Exchange. The only extra cost is the one
    percentile-sketch aggregate that ran eagerly for the cutoffs."""
    from data_engineer_project_spark.sources.io import zorder_key

    df = spark.range(10_000).selectExpr(
        "pmod(hash(id), 97) AS x", "id AS y"
    )
    keyed = zorder_key(df, ["x", "y"], bits=8)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "Sort" not in plan.replace("searchsorted", ""), plan


def test_zorder_key_handles_nulls_skew_and_mixed_types(spark):
    """Quantile cutoffs must survive what ntile survived: heavy skew
    (one dominant value), nulls (cluster at level 0, nulls-first like
    a sort), and date/string columns. Keys stay in range and equal
    inputs get equal keys."""
    from pyspark.sql import functions as F

    from data_engineer_project_spark.sources.io import zorder_key

    df = spark.range(20_000).selectExpr(
        # 90% of rows share x=0; the rest spread 1..1000
        "CASE WHEN id % 10 < 9 THEN 0 ELSE CAST(pmod(hash(id), 1000) AS INT) END AS x",
        "CASE WHEN id % 13 = 0 THEN NULL ELSE id END AS y",
        "date_add(date'2024-01-01', CAST(id % 365 AS INT)) AS d",
        "concat('u', CAST(id % 50 AS STRING)) AS s",
    )
    keyed = zorder_key(df, ["x", "y", "d", "s"], bits=8).cache()
    try:
        n_bits = 8 * 4
        stats = keyed.agg(
            F.min("__zkey").alias("lo"),
            F.max("__zkey").alias("hi"),
            F.count_distinct("__zkey").alias("nk"),
        ).first()
        assert stats.lo >= 0 and stats.hi < (1 << n_bits)
        assert stats.nk > 100  # skew didn't collapse the curve
        # determinism: same input tuple -> same key
        dup = (
            keyed.groupBy("x", "y", "d", "s")
            .agg(F.count_distinct("__zkey").alias("nkeys"))
            .agg(F.max("nkeys").alias("mx"))
            .first()
        )
        assert dup.mx == 1
    finally:
        keyed.unpersist()
