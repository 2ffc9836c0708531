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

# Accretion bound (round-10 advice): a long session that constructs
# many plans (skew_guarded_self_pairs persists + probes per call)
# would otherwise hold every handle until release_all. Handles are
# soft caches by contract — unpersisting one merely loses the cache
# benefit if its plan re-executes — so keep-latest-N is safe: any
# plan still being built uses the newest handles.
MAX_TRACKED = 32


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() ``df`` (default MEMORY_AND_DISK) and remember the
    handle so ``release_all`` can drop it later. Returns ``df``.
    Keeps at most ``MAX_TRACKED`` live handles — the oldest are
    unpersisted (non-blocking) when the bound is exceeded."""
    _TRACKED.append(df.persist())
    while len(_TRACKED) > MAX_TRACKED:
        old = _TRACKED.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass
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
