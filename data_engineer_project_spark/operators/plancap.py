"""Per-iteration physical-plan capture for loop-at-build operators.

Iterative operators (connected components, power iteration) execute
actions while their result DataFrame is being BUILT, so the plan
auditor (`tools/plan_audit.py`) cannot print their pipeline the way it
prints every lazy query — explaining the returned frame shows only the
post-localCheckpoint tail. This hook lets those operators hand one
representative iteration's plan to the auditor instead: capture is off
by default (zero overhead on the hot path beyond a bool check), the
auditor enables it around building each loop-at-build query, and the
operators grab the stage plans that carry the scale story — the pair
join feeding CC, the first pointer-jump round, one power-iteration
round.

Capturing calls ``executedPlan()`` on an un-executed frame, which
PLANS the query without running it — the same basis every other audit
slot records (AdaptiveSparkPlan isFinalPlan=false)."""

from __future__ import annotations

CAPTURES: list[tuple[str, str]] = []  # (label, plan text), in call order
_ENABLED = False


def enable() -> None:
    """Start capturing; clears previous captures."""
    global _ENABLED
    CAPTURES.clear()
    _ENABLED = True


def disable() -> None:
    global _ENABLED
    _ENABLED = False


def grab(label: str, df) -> None:
    """Record ``df``'s physical plan under ``label`` when capture is
    on. Never raises — the audit is best-effort and must not perturb
    the operator."""
    if not _ENABLED:
        return
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return
    CAPTURES.append((label, plan))


def grab_stream(label: str, query) -> None:
    """Record the last micro-batch's EXECUTED plan of a (finished or
    running) StreamingQuery under ``label`` when capture is on — the
    IncrementalExecution plan with the StateStoreRestore/Save pair,
    the REQUIRED_BY_STATEFUL_OPERATOR exchange, and the map-side
    partial aggregate, which the lazy batch audit can never show
    (round 12: the streaming bench slots previously carried
    citation-only evidence via their batch twins). Never raises."""
    if not _ENABLED:
        return
    try:
        jsq = query._jsq
        try:
            exec_ = jsq.streamingQuery().lastExecution()
        except Exception:
            exec_ = jsq.lastExecution()  # non-wrapper implementations
        CAPTURES.append((label, exec_.executedPlan().toString()))
    except Exception:
        return
