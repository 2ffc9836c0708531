"""Generate SCALING.md: headline-query runtimes across scale factors.

Runs bench.py at sf0.001 / sf0.01 / sf0.1 (100x data end to end) in
separate processes (fresh JVM each, so no cross-sf cache effects) and
tabulates per-query times with the 0.1/0.01 ratio. Data grows 10x
between those two; a ratio well under 10 means the query is dominated
by fixed overhead (healthy at this size), near 10 means linear, and
well over 10 flags super-linear work that would not survive 100 TB.

Usage: python tools/scaling_report.py [-o SCALING.md]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ("0.001", "0.01", "0.1")
PIN_MARKER = "<!-- pinned-notes -->"


def run_bench(sf: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf}")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    ).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    out_path = os.path.join(REPO, "SCALING.md")
    if "-o" in sys.argv:
        out_path = sys.argv[sys.argv.index("-o") + 1]

    results = {sf: run_bench(sf) for sf in SFS}
    names = list(results[SFS[0]]["queries"])

    lines = [
        "# SCALING — headline queries across 100× data",
        "",
        "`python tools/scaling_report.py`; one fresh JVM per scale factor.",
        "lineitem ≈ 6k / 60k / 600k rows at sf 0.001 / 0.01 / 0.1; events,",
        "documents, embeddings scale alongside. The `×(0.1/0.01)` column is",
        "the wall-time ratio against a 10× data step: ≪10 = fixed-overhead",
        "dominated, ≈10 = linear in data, ≫10 = super-linear (a scale bug).",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | ×(0.1/0.01) |",
        "|---|---|---|---|---|",
    ]
    for n in names:
        t = {sf: results[sf]["queries"].get(n) for sf in SFS}
        if any(v is None for v in t.values()):
            continue
        ratio = t["0.1"] / t["0.01"] if t["0.01"] else float("nan")
        lines.append(
            f"| {n} | {t['0.001']:.2f} | {t['0.01']:.2f} | {t['0.1']:.2f} "
            f"| {ratio:.1f} |"
        )
    totals = {sf: results[sf]["value"] for sf in SFS}
    lines.append(
        f"| **total** | **{totals['0.001']:.2f}** | **{totals['0.01']:.2f}** "
        f"| **{totals['0.1']:.2f}** | **{totals['0.1'] / totals['0.01']:.1f}** |"
    )
    lines.append("")

    # Preserve hand-written analysis: everything from the pinned-notes
    # marker onward in the existing file survives regeneration.
    pinned = ""
    if os.path.exists(out_path):
        existing = open(out_path).read()
        if PIN_MARKER in existing:
            pinned = existing[existing.index(PIN_MARKER) :]
    if pinned:
        lines.append(pinned)

    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
