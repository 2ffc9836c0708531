"""Sparse lexical retrieval (BM25) over the documents table.

A training-data curation primitive the reference's SQL surface lacks
but any large-scale pipeline needs: score documents against a fixed
term set (quality-matched sampling, retrieval-based decontamination,
topic filtering) and keep the top-k.

Scale design: for a FIXED query term set the term frequencies are
computed array-natively (``size(filter(tokens, x -> x = term))``) in a
single document scan — no explode, no per-term shuffle, everything
inside whole-stage codegen. The two scalar statistics (document count /
average doc length, per-term document frequencies) are one tiny
aggregate each, broadcast back with a 1-row cross join. The final
top-k is ORDER BY + LIMIT, which Spark plans as TakeOrderedAndProject
(per-partition heap + driver merge of k rows) — no global sort.

Oracle parity: the score avoids ``ln`` (not correctly-rounded, so the
last ulp may differ between the JVM and DuckDB) and uses the rational
idf (N - df + 0.5) / (df + 0.5) instead; +, -, *, / are all IEEE
correctly-rounded, so an identically-parenthesized formula bit-matches
across engines. ``bm25_oracle_sql`` generates the DuckDB twin from the
same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineer_project_spark.functions.text import words

K1 = 1.2
B = 0.75


def _tf(term: str):
    return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-``k`` documents by BM25 (rational-idf variant) for ``terms``.

    Returns (doc_id, score), score descending, doc_id ascending on ties.
    """
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    base = docs.select("doc_id", words("text").alias("toks")).withColumn(
        "dl", F.size("toks")
    )
    tf_cols = [_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)]
    # Deliberately NOT persisted: base is read twice (stats agg + final
    # scoring scan), but both are cheap whole-stage-codegen scans, and
    # caching a tokenized 100 TB corpus would exceed any cluster's
    # storage memory. Two scans are the scale-correct trade.
    base = base.select("doc_id", "dl", *tf_cols)

    stats = base.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        F.count(F.lit(1)).cast("double").alias("n"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).cast("double").alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))

    # identical parenthesization to bm25_oracle_sql — do not reorder
    norm = F.lit(k1) * (F.lit(1.0) - F.lit(b) + (F.lit(b) * F.col("dl").cast("double")) / F.col("avgdl"))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = (F.col("n") - F.col(f"df_{i}") + F.lit(0.5)) / (F.col(f"df_{i}") + F.lit(0.5))
        s = idf * ((tf * F.lit(k1 + 1.0)) / (tf + norm))
        score = s if score is None else score + s
    return (
        scored.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_oracle_sql(terms: list[str], k: int = 10, k1: float = K1, b: float = B) -> str:
    """DuckDB twin of ``bm25_topk`` — generated from the same constants
    and the same expression shape so doubles bit-match."""
    tf_defs = ",\n       ".join(
        "len(list_filter(toks, x -> x = '{t}')) AS tf_{i}".format(
            t=t.replace("'", "''"), i=i  # escape quotes for the SQL literal
        )
        for i, t in enumerate(terms)
    )
    df_defs = ",\n       ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(terms))
    )
    norm = f"{k1!r} * (1.0 - {b!r} + ({b!r} * CAST(dl AS DOUBLE)) / avgdl)"
    term_scores = [
        f"((n - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * ((CAST(tf_{i} AS DOUBLE) * {k1 + 1.0!r}) / (CAST(tf_{i} AS DOUBLE) + {norm}))"
        for i in range(len(terms))
    ]
    score = " + ".join(term_scores)
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS dl
      FROM documents
    ),
    tf AS (
      SELECT doc_id, dl,
       {tf_defs}
      FROM toks
    ),
    stats AS (
      SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             CAST(COUNT(*) AS DOUBLE) AS n,
       {df_defs}
      FROM tf
    )
    SELECT doc_id, {score} AS score
    FROM tf, stats
    ORDER BY score DESC, doc_id ASC
    LIMIT {k}
    """
