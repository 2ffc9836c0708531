"""Oracle type lint: every oracle's result columns must stay inside the
canonical type set the driver fingerprints identically to Spark.

The q12 incident (round 5): DuckDB types ``SUM(int)`` as HUGEINT, a type
Spark has no twin for, so the driver's canonicalizer hashed identical
values differently and the gate went red even though both engines
returned the same numbers.  This lint DESCRIBEs every registered oracle
against the sf0.001 views and fails on any column typed outside the
canonical set — catching the whole HUGEINT/INT128/UBIGINT class before
the driver ever runs.  It fails if the q12 CAST is reverted.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from tools.check_correctness import TABLES

from data_engineer_project_spark.queries import QUERIES

# Types with a lossless, identically-canonicalized Spark counterpart.
# HUGEINT/UHUGEINT/UBIGINT/UINTEGER/... are deliberately absent: Spark
# cannot produce them, so a driver-side fingerprint can diverge even on
# equal values.  Arrays of canonical types are canonical (documents /
# embeddings queries return DOUBLE[] / VARCHAR[]).
_CANONICAL = re.compile(
    r"^(BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE|VARCHAR"
    r"|DATE|TIMESTAMP|TIMESTAMP WITH TIME ZONE"
    r"|DECIMAL\(\d+,\s*\d+\))(\[\])*$"
)

_ORACLES = sorted(n for n, spec in QUERIES.items() if spec.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLES)
def test_oracle_result_types_are_canonical(name, duck):
    sql = QUERIES[name].oracle
    # DESCRIBE binds and plans without executing — cheap for all 200+.
    rows = duck.execute(f"DESCRIBE {sql}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if not _CANONICAL.match(typ)
    ]
    assert not bad, (
        f"{name}: oracle columns typed outside the canonical set "
        f"(add an explicit CAST in the oracle SQL): {bad}"
    )
