"""Registry for per-call soft caches (``persist()`` handles).

Dedup/graph operators persist intermediates that feed several plan
consumers (signature build + size table + both verify-join sides).
Those are soft caches — LRU-evictable, never a correctness dependency
— but each operator invocation creates NEW handles, so a long-lived
session running many queries (the 175-query correctness gate, the
multi-run bench loop) accumulates cached blocks without bound until
memory pressure forces eviction.

``tracked_persist`` registers every such handle; ``release_all`` drops
whatever has accumulated. Harnesses call ``release_all`` between
queries/runs; library callers can ignore it entirely (eviction still
works). At 100 TB the production form of these intermediates is an
explicit checkpointed/bucketed table (see ``dedup.shingle_table``),
not an executor cache — this registry is the session-hygiene
complement for the inline form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() ``df`` (default MEMORY_AND_DISK) and remember the
    handle so ``release_all`` can drop it later. Returns ``df``."""
    _TRACKED.append(df.persist())
    return df


def release_all() -> int:
    """Unpersist every tracked handle (non-blocking); returns how many
    were released. Safe to call with a stopped/replaced session —
    failures to unpersist dead handles are ignored."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
