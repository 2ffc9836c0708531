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
