"""The shared OHLC open/close ordering key — ONE definition for the
batch query (e13), the streaming operator (ohlc_bars / s15), and the
tests, so the three can't silently diverge.

Deterministic open/close selection needs a SCALAR ordering key (DuckDB's
arg_min/arg_max take no struct keys), so both engines order by the
(timestamp, event_id) pair folded into one 128-bit-class integer:
``epoch_us(ts) * 2^64 + (event_id + 2^63)``, Spark DECIMAL(38,0) /
DuckDB HUGEINT.

Why the 2^64 slot and the +2^63 offset: event_id is a full int64, which
spans 2^64 values. A 2^63 multiplier (the previous form) is too narrow —
a NEGATIVE id at a later microsecond could produce a smaller key than a
large positive id at an earlier one (e.g. id=-5 at ts+1µs vs id=2^63-1
at ts), selecting the wrong open/close. Offsetting ids into [0, 2^64)
and multiplying timestamps by the full 2^64 makes the fold a true
mixed-radix number: ordered first by ts, then by id, for EVERY int64
id. Magnitude stays safe: epoch_us·2^64 tops out ~7.6e34 for year-2100
timestamps, inside both 38-digit DECIMAL and HUGEINT.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

_SLOT = Decimal(2**64)  # spans ALL int64 event_ids
_ID_OFFSET = Decimal(2**63)  # shift int64 ids into [0, 2^64)

# DuckDB twin of ohlc_order_key(), verbatim for oracle SQL.
OHLC_KEY_SQL = (
    "CAST(epoch_us(ts) AS HUGEINT) * 18446744073709551616"
    " + (CAST(event_id AS HUGEINT) + 9223372036854775808)"
)


def ohlc_order_key() -> Column:
    """(ts, event_id)-ordered scalar key over columns ``ts`` (timestamp)
    and ``event_id`` (int64). See module docstring for the width
    argument."""
    return F.unix_micros("ts").cast("decimal(38,0)") * _SLOT + (
        F.col("event_id").cast("decimal(38,0)") + _ID_OFFSET
    )
