"""Scheduled run of the diagnostic spot-check lane (r12 verdict #7).

d74_pagerank_canonical_doc and m10_image_neardup_clusters rotated out
of the sf0.1 headline in round 12 (their production twins d89/m18 hold
the headline slots) but carried their pins for the lane — and nothing
ran that lane on a cadence, so a silent regression in the diagnostic
tier would have gone unmeasured. This script IS the cadence: run it
once per round (round-start protocol, alongside committing the prior
round's evidence files); it executes the lane through bench.py's
single-slot machinery at sf0.1 (the scale the pins were taken at) and
writes ``SPOT_r{N}.json`` next to ``BENCH_r{N}.json``, with per-slot
pin ratios and the same load-taint stamp the headline records carry.

Usage:  python tools/spot_lane.py [--runs N]   (default min-of-6,
the protocol the round-14 lane pins were taken under)

The round number N is inferred as max(existing BENCH_r*) + 1 — i.e.
"the round being built now"; pass --round to override.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Lane-context pins, re-taken round 14 (BASELINE.md "lane pins" note):
# the original carried pins (d74 6.955, m10 5.114) were taken in
# HEADLINE position inside full bench runs, where dozens of earlier
# slots warm shared state; a solo lane run never sees that warmth, and
# the r14 triage measured the inflation as systematic (e03 solo
# min-of-6 = 2.06x its own full-run record on UNCHANGED code; d73
# 1.20x; m02 1.28x). Both twins (d89/m18) run inside their headline
# pins, so the machinery is not regressed — the lane just needed pins
# taken in lane context: idle min-of-6 through this exact invocation.
LANE_PINS = {
    "d74_pagerank_canonical_doc": 7.202,
    "m10_image_neardup_clusters": 6.564,
}


def infer_round() -> int:
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", f))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> None:
    args = sys.argv[1:]
    # min-of-6, matching the protocol the round-14 lane pins were
    # taken under — a min-of-3 lane run against a min-of-6 pin bakes
    # ~1.3x of pure ordering noise into the ratio (measured r14).
    runs = "6"
    rnd = None

    def flag_value(name: str) -> str | None:
        if name not in args:
            return None
        i = args.index(name)
        if i + 1 >= len(args):
            sys.exit(f"usage: spot_lane.py [--runs N] [--round N] "
                     f"({name} needs a value)")
        return args[i + 1]

    v = flag_value("--runs")
    if v is not None:
        if not v.isdigit() or int(v) < 1:
            sys.exit(f"--runs must be a positive integer, got {v!r}")
        runs = v
    v = flag_value("--round")
    if v is not None:
        if not v.isdigit():
            sys.exit(f"--round must be an integer, got {v!r}")
        rnd = int(v)
    if rnd is None:
        rnd = infer_round()

    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = "d74,m10"
    env["SPARK_GRAFT_BENCH_INCLUDE_SPOT"] = "1"
    env["SPARK_GRAFT_BENCH_RUNS"] = runs
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    record = None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            cand = json.loads(line)
        except ValueError:
            continue
        if isinstance(cand, dict) and "queries" in cand:
            record = cand
            break
    if proc.returncode != 0 or record is None:
        sys.stderr.write(proc.stderr[-2000:] + "\n")
        sys.exit(f"spot lane bench run failed (rc={proc.returncode})")

    out = {
        "lane": "diagnostic_spot_check",
        "round": rnd,
        "sf": record.get("sf"),
        "runs_per_query": record.get("runs_per_query"),
        "queries": record["queries"],
        "pins": LANE_PINS,
        "pin_ratio": {
            n: round(t / LANE_PINS[n], 3)
            for n, t in record["queries"].items()
            if n in LANE_PINS
        },
        "load": record.get("load"),
    }
    path = os.path.join(REPO, f"SPOT_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
