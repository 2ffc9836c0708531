"""EP1/EP3 catalog surface (SURVEY §2.1, §2.9): CREATE DATABASE/SCHEMA
guards, CREATE TABLE ... USING parquet, INSERT...SELECT append, view
create/replace/drop — the reference's DDL lifecycle on Spark's catalog,
idempotent the way its IF NOT EXISTS guards are."""

from __future__ import annotations

import pytest


@pytest.fixture()
def warehouse_db(spark, tmp_path):
    db = "cca_healthcare_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_database_bootstrap_idempotent(spark, warehouse_db):
    # the reference's IF DB_ID(...) guard (`Members&EligibilitySource.sql:1-6`)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {warehouse_db}")
    assert spark.catalog.databaseExists(warehouse_db)


def test_create_insert_select_table(spark, warehouse_db, tmp_path):
    from data_engineer_project_spark.sources.registry import load_tables

    nation = load_tables(spark, "/root/testdata/sf0.001").nation
    tbl = f"{warehouse_db}.nation"
    loc = str(tmp_path / "nation_tbl")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {tbl} "
        "(n_nationkey INT, n_name STRING, n_regionkey INT) "
        f"USING parquet LOCATION '{loc}'"
    )
    # INSERT ... SELECT (`StarSchemaForHealthcare.sql:165-173`)
    nation.write.mode("append").insertInto(tbl)
    assert spark.table(tbl).count() == nation.count()
    # idempotent reload via overwrite (the NOT EXISTS upsert equivalent)
    nation.write.mode("overwrite").insertInto(tbl, overwrite=True)
    assert spark.table(tbl).count() == nation.count()


def test_alter_table_add_column_idempotent(spark, warehouse_db, tmp_path):
    """Schema evolution: ALTER TABLE ADD COLUMNS guarded the way the
    reference guards with COL_LENGTH (`SQLQueryiesPractice.sql:147-150`)
    — second invocation is a no-op, and existing rows read NULL until
    backfilled by a rebuild (parquet has no in-place UPDATE)."""
    tbl = f"{warehouse_db}.regions_ddl"
    loc = str(tmp_path / "regions_ddl")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {tbl} (r_regionkey INT, r_name STRING) "
        f"USING parquet LOCATION '{loc}'"
    )
    spark.sql(f"INSERT INTO {tbl} VALUES (0, 'AFRICA'), (1, 'AMERICA')")

    def add_flag_column():
        # COL_LENGTH(...) IS NULL guard ≙ check the catalog schema first
        if "r_flag" not in spark.table(tbl).columns:
            spark.sql(f"ALTER TABLE {tbl} ADD COLUMNS (r_flag STRING)")

    add_flag_column()
    add_flag_column()  # idempotent: no duplicate column, no error
    assert spark.table(tbl).columns == ["r_regionkey", "r_name", "r_flag"]
    # pre-existing rows surface NULL for the new column
    assert all(r.r_flag is None for r in spark.table(tbl).collect())
    # backfill = derived-column rebuild (the UPDATE-with-JOIN pattern, p25)
    filled = spark.createDataFrame(
        [(r.r_regionkey, r.r_name, "Y") for r in spark.table(tbl).collect()],
        spark.table(tbl).schema,
    )
    filled.write.mode("overwrite").insertInto(tbl, overwrite=True)
    assert {r.r_flag for r in spark.table(tbl).collect()} == {"Y"}


def test_view_lifecycle(spark):
    from data_engineer_project_spark.sources.registry import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    t.region.createOrReplaceTempView("vw_region_t")
    assert spark.sql("SELECT COUNT(*) c FROM vw_region_t").collect()[0].c == 5
    # ALTER VIEW ≙ re-issue CREATE OR REPLACE (`SQLQueryiesPractice.sql:225-238`)
    t.region.selectExpr("r_regionkey", "upper(r_name) AS r_name").createOrReplaceTempView(
        "vw_region_t"
    )
    names = {r.r_name for r in spark.sql("SELECT r_name FROM vw_region_t").collect()}
    assert names == {n.upper() for n in names}
    # sp_rename ≙ drop + recreate (`SQLQueryiesPractice.sql:242-244`)
    spark.catalog.dropTempView("vw_region_t")
    assert not spark.catalog.tableExists("vw_region_t")


def test_analyze_table_computes_stats(spark, warehouse_db, tmp_path):
    """ANALYZE TABLE ... COMPUTE STATISTICS: at 100 TB the cost-based
    optimizer needs row counts / column NDVs to pick join orders and
    broadcast sides; the engine's catalog tables must accept and expose
    them (the reference's UPDATE STATISTICS equivalent)."""
    tbl = f"{warehouse_db}.stats_ddl"
    loc = str(tmp_path / "stats_ddl")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {tbl} (k INT, v STRING) "
        f"USING parquet LOCATION '{loc}'"
    )
    spark.sql(f"INSERT INTO {tbl} SELECT id, CAST(id % 5 AS STRING) FROM range(1000)")
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS k, v")
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
    }
    assert "1000 rows" in desc.get("Statistics", ""), desc.get("Statistics")
    kcol = spark.sql(f"DESCRIBE EXTENDED {tbl} k").collect()
    kinfo = {r.info_name: r.info_value for r in kcol}
    assert kinfo.get("distinct_count") not in (None, "NULL"), kinfo
