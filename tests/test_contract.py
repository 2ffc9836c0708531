"""Driver-contract robustness: the documented failure modes must stay
stable (bad sf_dir → AnalysisException, unknown table → KeyError), the
entry point must work on a plain foreign session, and every registered
oracle must be valid DuckDB SQL (parse check, no execution)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.errors.exceptions.captured import AnalysisException

import __spark_entry__ as E
from data_engineer_project_spark.queries import QUERIES
from data_engineer_project_spark.sources.registry import read_table
from tools.check_correctness import TABLES


def test_bad_sf_dir_raises_analysis_exception(spark):
    with pytest.raises(AnalysisException):
        QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf-nope").collect()


def test_unknown_table_raises_keyerror(spark):
    with pytest.raises(KeyError):
        read_table(spark, "/root/testdata/sf0.001", "not_a_table")


def test_entry_contract(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns[0] == "l_returnflag"
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(QUERIES)


def test_all_oracles_parse_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except Exception as exc:  # pragma: no cover
            pytest.fail(f"oracle for {name} does not parse: {exc}")


def test_gate_order_puts_unverified_families_first():
    """The driver records a ~50-entry prefix of queries() per round;
    queries/__init__ re-ranks by green-count across CORRECTNESS_r*.json
    so never-verified queries come first. Pin that: the hq reference-
    parity family leads, and everything green in round 1 sits behind
    every 0-green query."""
    import json
    from pathlib import Path

    names = list(QUERIES)
    assert names[0].startswith("hq"), names[:3]
    hq = {n for n in names if n.startswith("hq")}
    assert set(names[: len(hq)]) == hq

    r1 = json.loads(Path(__file__).resolve().parents[1].joinpath(
        "CORRECTNESS_r01.json").read_text())
    r1_green = {n for n, res in r1.items() if res.get("hash_match")}
    first_unverified = [n for n in names if n not in r1_green]
    # every r1-green query ranks after every never-verified one
    assert names[: len(first_unverified)] == first_unverified
