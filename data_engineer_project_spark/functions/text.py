"""Text-analysis primitives for training-data pipelines.

All pure Spark SQL expressions (array/lambda functions) — no Python
UDFs, so everything stays JVM-side inside whole-stage codegen and
scales linearly with input splits. Each primitive has a documented
DuckDB-SQL twin used by the oracle queries.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def words(text: str | Column) -> Column:
    """Whitespace tokenization as a native array (no explode needed)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: str | Column) -> Column:
    return F.size(words(text))


def bpe_token_estimate(text: str | Column) -> Column:
    """BPE-ish token estimate: ~4 chars/token heuristic (ceil)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.ceil(F.length(c) / F.lit(4)).cast("long")


def stopword_count(text: str | Column, stopwords=STOPWORDS) -> Column:
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(words(text), lambda x: F.array_contains(sw, x)))


def shingles(text: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (array-native, no
    explode): transform over a 0..len-n index sequence."""
    w = words(text)
    idx = F.sequence(F.lit(0), F.size(w) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)])
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def md5_fingerprint(text: str | Column) -> Column:
    """Exact-duplicate fingerprint: md5 of the raw text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def prefix_fingerprint(text: str | Column, n_words: int = 10) -> Column:
    """Fingerprint of the first n words — cheap near-dup blocking key
    (rolling-hash family; leading-content collisions)."""
    w = words(text)
    return F.md5(F.concat_ws(" ", F.slice(w, 1, n_words)))


_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def hex_digit_parity(md5_col: Column, pos: int) -> Column:
    """Parity (0/1) of hex digit ``pos`` (0-based) of an md5 string —
    a portable 1-bit hash every engine agrees on. Implemented as set
    membership of the odd hex chars: an InSet string compare is ~5×
    cheaper than conv() radix parsing, and this runs 16× per word in
    SimHash."""
    return F.when(F.substring(md5_col, pos + 1, 1).isin(*_ODD_HEX), 1).otherwise(0)


def _parity_of_md5(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[0], 16) % 2


def hyperplane(plane_id: int, dim: int) -> list[int]:
    """Deterministic ±1 pseudo-random hyperplane for sign-LSH, derived
    from md5 parities so Spark code and oracle SQL share identical
    literals (no RNG, reproducible across engines/rounds)."""
    return [2 * _parity_of_md5(f"{plane_id}-{d}") - 1 for d in range(dim)]
