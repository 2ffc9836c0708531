"""Round-8 pressure rows: the new ops with data-dependent state
(e27 grid, e28 trailing-distinct fan-out, d84 cell histogram, m16
decode volume, d82 recall arms) at 1x and 10x of sf0.1, reusing
scale_stress.synth (events time-shifted, docs/embeddings id-shifted).
One JSON line per measurement, emitted as measured."""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_stress import synth  # noqa: E402


def measure(
    spark, sf_dir: str, label: str, runs: int = 2, only: set | None = None
) -> None:
    from data_engineer_project_spark.operators.cache import release_all
    from data_engineer_project_spark.queries import QUERIES

    def run_query(name, extract=None):
        if only and name not in only:
            return
        best, extra = None, {}
        for _ in range(runs):
            t0 = time.time()
            rows = QUERIES[name].fn(spark, sf_dir).collect()
            dt = time.time() - t0
            extra = extract(rows) if extract else {}
            best = dt if best is None else min(best, dt)
            release_all()
        print(
            json.dumps(
                {"op": name, "scale": label, "sec": round(best, 2), **extra}
            ),
            flush=True,
        )

    run_query(
        "e27_cusum_changepoint",
        lambda rows: {
            "n_types": len(rows),
            "grid_days": rows[0].n_days,
            "max_excursion_days": max(
                round(r.max_cusum / (r.n_days * max(r.total_events, 1)), 4)
                for r in rows
            ),
        },
    )
    run_query(
        "e28_dau_wau_stickiness",
        lambda rows: {
            "spine_days": len(rows),
            "peak_wau": max(r.wau for r in rows),
        },
    )
    run_query(
        "d84_cluster_balanced_sampling",
        lambda rows: {
            "n_cells": len(rows),
            "kept_tokens": sum(r.kept_tokens for r in rows),
            "orig_tokens": sum(r.orig_tokens for r in rows),
        },
    )
    run_query(
        "m16_container_integrity_gate",
        lambda rows: {
            "verdict_rows": len(rows),
            "corrupt_docs": sum(
                r.n_docs for r in rows if r.status == "corrupt"
            ),
        },
    )
    run_query(
        "d82_ivfpq_recall",
        lambda rows: {
            "recall_np1": round(rows[0].recall_at_10, 3),
            "recall_np2": round(rows[1].recall_at_10, 3),
        },
    )
    run_query(
        "d87_bigram_surprisal_filter",
        lambda rows: {
            "n_bands": len(rows),
            "scored_docs": sum(r.n_docs for r in rows),
            "kept_docs": sum(r.n_docs for r in rows if r.tier == "keep"),
            "unseen_pairs": sum(r.unseen_pairs for r in rows),
        },
    )
    run_query(
        "e29_ewma_baseline_anomaly",
        lambda rows: {
            "n_types": len(rows),
            "scored_days": rows[0].n_scored,
            "flagged": sum(r.n_flagged for r in rows),
        },
    )
    run_query(
        "d89_weighted_pagerank_canonical",
        lambda rows: {
            "n_components": len(rows),
            "n_reps": sum(r.n_reps for r in rows),
            "total_docs": sum(r.total_docs for r in rows),
            "agree_pct": round(
                100.0 * sum(r.same_pick for r in rows) / max(len(rows), 1), 1
            ),
        },
    )
    run_query(
        "d88_heaps_vocab_growth",
        lambda rows: {
            "cum_types": rows[-1].cum_types,
            "cum_tokens": rows[-1].cum_tokens,
            "final_rate": rows[-1].types_per_10k_tokens,
        },
    )
    run_query(
        "d90_hashed_nb_classifier",
        lambda rows: {
            "scored_docs": sum(r.n_docs for r in rows),
            "correct_docs": sum(
                r.n_docs
                for r in rows
                if (r.lang == "en") == (r.predicted == "en")
            ),
        },
    )
    run_query(
        "d91_shard_manifest",
        lambda rows: {
            "shards": len(rows),
            "max_share": round(
                max((r.chars_share for r in rows), default=0.0), 4
            ),
            "corpus_checksum": sum(r.payload_checksum for r in rows),
        },
    )
    run_query(
        "d92_good_turing_completeness",
        lambda rows: {
            "sources": len(rows),
            "max_unseen_mass": round(
                max(r.unseen_mass for r in rows), 4
            ),
            "undiscovered_types": int(
                sum(r.chao1_est - r.n_types for r in rows)
            ),
        },
    )
    run_query(
        "m17_image_query_retrieval",
        lambda rows: {
            "matches": len(rows),
            "queries_hit": len({r.query_doc for r in rows}),
            "max_hamming": max((r.hamming for r in rows), default=None),
        },
    )
    run_query(
        "d93_mixture_temperature",
        lambda rows: {
            "sources": len(rows),
            "w_half_sum": round(sum(r.w_half for r in rows), 9),
            "max_epochs_half": round(
                max(r.epochs_half for r in rows), 3
            ),
        },
    )
    run_query(
        "d94_chunk_retrieval_eval",
        lambda rows: {
            "queries": len(rows),
            "self_hits": sum(r.self_hit for r in rows),
        },
    )
    run_query(
        "d95_partitioned_roundtrip_audit",
        lambda rows: {
            "langs": len(rows),
            "docs": sum(r.n_docs for r in rows),
            "corpus_checksum": sum(r.payload_checksum for r in rows),
        },
    )
    run_query(
        "d96_dedup_threshold_calibration",
        lambda rows: {
            "cuts": {
                int(r.threshold_pct): [int(r.n_pairs), int(r.n_docs_removed)]
                for r in rows
            },
        },
    )
    run_query(
        "d97_classifier_threshold_calibration",
        lambda rows: {
            "cuts": {
                int(r.tau): [int(r.tp), int(r.fp)] for r in rows
            },
            # None when the holdout is empty (no tau=0 row) or has no
            # 'en' docs (recall_en NULL) — record the degenerate slot
            # instead of aborting the sweep
            "recall_at_0": next(
                (
                    round(r.recall_en, 4)
                    for r in rows
                    if r.tau == 0 and r.recall_en is not None
                ),
                None,
            ),
        },
    )
    run_query(
        "d98_duplication_profile",
        lambda rows: {
            "multiplicities": sorted(int(r.cluster_size) for r in rows),
            "removable_docs": sum(r.removable_docs for r in rows),
            "reclaimable_chars": sum(r.reclaimable_chars for r in rows),
        },
    )
    run_query(
        "e30_crosscorr_lead_lag",
        lambda rows: {
            "pairs": sum(r.is_best for r in rows),
            "grid_hours": max((r.n_hours for r in rows), default=0),
            "best_lags": sorted(
                {int(r.lag) for r in rows if r.is_best}
            ),
        },
    )


def main() -> None:
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    factor = int(argv[0]) if argv else 10
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"

    from data_engineer_project_spark.session import get_spark

    spark = get_spark("stress-r8-ops")
    spark.sparkContext.setLogLevel("ERROR")

    measure(spark, sf_dir, "1x", only=only)
    tmp = tempfile.mkdtemp(prefix="stress_r8ops_")
    try:
        synth(sf_dir, tmp, factor)
        measure(spark, tmp, f"{factor}x", only=only)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
