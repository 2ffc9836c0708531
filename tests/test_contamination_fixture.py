"""Adversarial-contamination fixture for the decontamination family.

Round-6 verdict item 5: the forced-broadcast removal (d55/d56/d61) only
matters when the leaky set is LARGE — the exact case decontamination
exists for. This module synthesizes a corpus where >=30% of train docs
leak (each shares two informative 3-shingles with a test doc, spread
across many distinct phrases so the df <= 50 informative filter keeps
every one of them visible) at sf0.1 document count, then asserts the
queries complete AND hash-match their DuckDB oracles on that corpus —
the contamination-shaped twin of the ordinary parity sweep.

Fixture construction notes:
- phrase df is 41 (40 train copies + 1 test owner), inside the
  informative band (1 < df <= 50); a single mass-copied phrase would
  exceed df 50 and be invisible BY DESIGN, so contamination is spread
  over ceil(n_leaky / 40) distinct phrases.
- filler words embed the doc_id, so every non-phrase shingle has df 1
  and is inert to the overlap join.
- buckets replicate the engine's md5 split (int(md5(str(id))[:2], 16)
  % 100): train < 80, test >= 90 — cross-checked against d18's split
  assignment in-test before anything else runs.
"""

from __future__ import annotations

import hashlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tools.check_correctness import result_fingerprint

from data_engineer_project_spark.queries import QUERIES

N_DOCS = 60_000  # sf0.1 document count
COPIES_PER_PHRASE = 40  # phrase df = 41 <= 50 stays informative
TARGET_LEAK_FRACTION = 0.4

_LANGS = ("en", "de", "fr", "es", "zh")
_SOURCES = ("web", "wiki", "books", "code")


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % 100


@pytest.fixture(scope="module")
def contaminated_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("contaminated")
    train = [i for i in range(N_DOCS) if _bucket(i) < 80]
    test = [i for i in range(N_DOCS) if _bucket(i) >= 90]
    n_leaky = int(len(train) * TARGET_LEAK_FRACTION)
    phrase_of_test = {
        t: f"leaka{k} leakb{k} leakc{k} leakd{k}" for k, t in enumerate(test)
    }
    leaky_train = train[:n_leaky]
    # round-robin: phrase p is copied into at most COPIES_PER_PHRASE
    # train docs, so its df stays 41
    assignment = {
        d: test[j // COPIES_PER_PHRASE % len(test)]
        for j, d in enumerate(leaky_train)
    }
    rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(N_DOCS):
        filler = f"f{i}a f{i}b f{i}c f{i}d f{i}e"
        if i in assignment:
            text = f"{phrase_of_test[assignment[i]]} {filler}"
        elif _bucket(i) >= 90:
            text = f"{phrase_of_test[i]} {filler}"
        else:
            text = filler
        rows["doc_id"].append(i)
        rows["text"].append(text)
        rows["lang"].append(_LANGS[i % len(_LANGS)])
        rows["source"].append(_SOURCES[i % len(_SOURCES)])
        rows["n_chars"].append(len(text))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "text": pa.array(rows["text"], pa.string()),
                "lang": pa.array(rows["lang"], pa.string()),
                "source": pa.array(rows["source"], pa.string()),
                "n_chars": pa.array(rows["n_chars"], pa.int64()),
            }
        ),
        str(root / "documents.parquet"),
    )
    return str(root), len(train), n_leaky


@pytest.fixture(scope="module")
def contaminated_duck(contaminated_dir):
    sf, _, _ = contaminated_dir
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    yield con
    con.close()


def _parity(name, spark, sf, duck):
    spec = QUERIES[name]
    df = spec.fn(spark, sf)
    sfp = result_fingerprint(df.columns, [tuple(r) for r in df.collect()])
    cur = duck.execute(spec.oracle)
    dfp = result_fingerprint([d[0] for d in cur.description], cur.fetchall())
    assert sfp["cols"] == dfp["cols"], f"{name}: column mismatch"
    assert sfp["rows"] == dfp["rows"], f"{name}: row count mismatch"
    assert sfp["hash"] == dfp["hash"], f"{name}: value hash mismatch"
    return df


def test_bucket_replication_matches_engine(spark, contaminated_dir):
    sf, n_train, _ = contaminated_dir
    rows = QUERIES["d18_hash_split"].fn(spark, sf).collect()
    got_train = sum(1 for r in rows if r.split == "train")
    assert got_train == n_train


def test_d55_removes_the_leaky_mass_and_matches_oracle(
    spark, contaminated_dir, contaminated_duck
):
    sf, n_train, n_leaky = contaminated_dir
    df = _parity("d55_clean_train_split", spark, sf, contaminated_duck)
    agg = df.collect()
    removed = sum(r.n_removed for r in agg)
    total = sum(r.n_train for r in agg)
    assert total == n_train
    # every planted leaky doc shares 2 informative shingles with a test
    # doc, so the whole planted mass must be caught
    assert removed >= n_leaky
    assert removed / total >= 0.3, "contamination fixture must be heavy"


def test_d61_touches_the_leaky_mass_and_matches_oracle(
    spark, contaminated_dir, contaminated_duck
):
    sf, n_train, n_leaky = contaminated_dir
    df = _parity(
        "d61_decontamination_span_masking", spark, sf, contaminated_duck
    )
    agg = df.collect()
    touched = sum(r.n_docs_touched for r in agg)
    assert sum(r.n_train_docs for r in agg) == n_train
    assert touched >= n_leaky
    assert all(r.masked_tokens < r.total_tokens for r in agg), (
        "span masking must keep the non-leaked remainder of every lang"
    )


def test_d56_dag_survives_heavy_contamination(spark, contaminated_dir):
    """The composed curation DAG (whose leaky anti-join lost its forced
    broadcast this round) must complete on a corpus where the leaky set
    is ~40% of train — the case the hint removal exists for."""
    sf, _, _ = contaminated_dir
    rows = QUERIES["d56_end_to_end_curation"].fn(spark, sf).collect()
    assert rows, "the DAG must keep the clean remainder"
    assert all(r.n_docs >= 1 for r in rows)
