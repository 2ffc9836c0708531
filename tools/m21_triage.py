"""m21 variance triage (r15, VERDICT r14 item 7): the slot swung
0.39x in the r14 driver run and 1.0->8.8 s across r14-session runs on
UNCHANGED code. This harness separates the candidate causes inside ONE
session:

  1. sidecar spawn cost (guide §4.5 per-task init): count the live
     decoder JVMs before/after each rep — if the fleet is stable
     across reps but rep times still swing, spawn cost is not the
     within-session driver.
  2. Arrow-stage cold JIT / codegen: rep 1 vs steady-state floor.
  3. box phase noise: the spread of reps 2..N at fixed code and a
     warm fleet — anything left is the box, not the operator.

It also times the python-engine twin (m15 body, engine="python") in
the same session: if both engines swing together the cause is the
shared Arrow plumbing or the box, not the JVM sidecar.

Usage: python tools/m21_triage.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_project_spark.operators.cache import release_all  # noqa: E402
from data_engineer_project_spark.queries import QUERIES  # noqa: E402
from data_engineer_project_spark.session import get_spark  # noqa: E402


def n_sidecars() -> int:
    """Live decoder JVMs (the sidecar main class) on this box."""
    try:
        out = subprocess.run(
            ["ps", "-eo", "cmd"], capture_output=True, text=True, timeout=10
        ).stdout
    except Exception:
        return -1
    return sum(
        1 for line in out.splitlines() if "NativeDecodeServer" in line
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(
        "m21-triage", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups the bench applies, so rep 1 isn't worker-fork cost
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    import pandas as _pd  # noqa: F401

    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    for name in ("m21_native_container_decode", "m16_container_integrity_gate"):
        print(f"== {name}")
        for i in range(reps):
            before = n_sidecars()
            load0 = os.getloadavg()[0]
            t0 = time.time()
            QUERIES[name].fn(spark, sf_dir).collect()
            dt = time.time() - t0
            release_all()
            print(
                f"  rep {i}: {dt:7.3f}s  sidecars {before}->{n_sidecars()}"
                f"  load {load0:.1f}->{os.getloadavg()[0]:.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
