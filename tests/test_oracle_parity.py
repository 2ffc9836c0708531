"""Every registered query must hash-match its DuckDB oracle twin.

This replicates the driver's t2 gate (row count + column names +
order-insensitive value hash) at smoke scale so regressions surface in
pytest before the driver runs.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.check_correctness import TABLES, result_fingerprint

from data_engineer_project_spark.queries import QUERIES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    sfp = result_fingerprint(df.columns, [tuple(r) for r in df.collect()])
    if spec.oracle is None:
        assert sfp["rows"] >= 0  # rows-only contract: runs and is stable
        return
    cur = duck.execute(spec.oracle)
    dfp = result_fingerprint([d[0] for d in cur.description], cur.fetchall())
    assert sfp["cols"] == dfp["cols"], f"{name}: column mismatch"
    assert sfp["rows"] == dfp["rows"], f"{name}: row count mismatch"
    assert sfp["hash"] == dfp["hash"], (
        f"{name}: value hash mismatch\nspark sample: {sfp['sample']}\n"
        f"duck sample: {dfp['sample']}"
    )
