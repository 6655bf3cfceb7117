#!/usr/bin/env python
"""Reproducible accuracy sweep (VERDICT r2 missing #1/#5/#6).

Runs the full pipeline over N randomized planted-SV panels WITH the
sequencing-error model on (tests/scenarios.build_scenario: every seed
carries 3 random-kind SVs, one two-SV region, and a matched-normal
germline-subtraction scenario), plus M SV-free noisy panels for the
false-positive operating point of the filter stack.

Emits one JSON artifact (default ACCURACY_r03.json): per-SV-type recall,
germline-subtraction leak count, FP region/call counts, and the first
failure details for triage.

Usage: python tools/sweep_accuracy.py [--seeds 200] [--fp 50]
       [--out ACCURACY_r03.json] [--start-seed 0]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from breakmer_tpu.config import Config  # noqa: E402
from breakmer_tpu.runner import Runner  # noqa: E402
from tests.fixtures import ErrorModel  # noqa: E402
from tests.scenarios import build_fp_scenario, build_scenario  # noqa: E402


def run_recall_seed(seed: int, stats, failures, error_model=None) -> None:
    work = Path(tempfile.mkdtemp(prefix=f"sweep{seed}_"))
    try:
        kw = {} if error_model is None else {"error_model": error_model}
        cfg_kwargs, checks = build_scenario(
            seed, work, n_genes=4, with_normal_germline=True,
            multi_sv_gene=True, **kw,
        )
        runner = Runner(Config(**cfg_kwargs))
        runner.setup()
        events = runner.run()
        for gene, (kind, check) in checks.items():
            evs = [e for e in events if e.genes.split(",")[0] == gene]
            fails = check(evs)
            stats[kind]["n"] += 1
            if fails:
                stats[kind]["fail"] += 1
                failures.extend(f"seed {seed} {gene}: {f}" for f in fails)
            else:
                stats[kind]["ok"] += 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_fp_seed(seed: int, fp_stats, fp_details, error_model=None) -> None:
    work = Path(tempfile.mkdtemp(prefix=f"fp{seed}_"))
    try:
        kw = {} if error_model is None else {"error_model": error_model}
        cfg_kwargs = build_fp_scenario(seed, work, n_genes=4, **kw)
        runner = Runner(Config(**cfg_kwargs))
        runner.setup()
        events = runner.run()
        fp_stats["regions"] += 4
        fp_stats["calls"] += len(events)
        genes_hit = {e.genes for e in events}
        fp_stats["regions_with_calls"] += len(genes_hit)
        for e in events:
            fp_details.append(
                f"seed {seed} {e.genes}: {e.sv_type}/{e.sv_subtype} "
                f"size {e.size} at {e.breakpoints_str()} "
                f"(sr={e.split_read_count})"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=200)
    ap.add_argument("--fp", type=int, default=50)
    ap.add_argument("--start-seed", type=int, default=0)
    ap.add_argument("--out", default=str(REPO / "ACCURACY_r03.json"))
    ap.add_argument("--sub-rate", type=float, default=None,
                    help="override ErrorModel.sub_rate (stress runs)")
    ap.add_argument("--indel-rate", type=float, default=None)
    ap.add_argument("--q-start", type=int, default=None)
    ap.add_argument("--q-end", type=int, default=None)
    ap.add_argument("--miscalibrated", type=float, default=None)
    args = ap.parse_args()
    em_kw = {k: v for k, v in (
        ("sub_rate", args.sub_rate), ("indel_rate", args.indel_rate),
        ("q_start", args.q_start), ("q_end", args.q_end),
        ("miscalibrated", args.miscalibrated),
    ) if v is not None}
    error_model = ErrorModel(**em_kw) if em_kw else None

    t0 = time.time()
    stats = defaultdict(lambda: {"n": 0, "ok": 0, "fail": 0})
    failures: list[str] = []
    for i in range(args.seeds):
        seed = args.start_seed + i
        run_recall_seed(seed, stats, failures, error_model)
        if (i + 1) % 20 == 0:
            done = {k: f"{v['ok']}/{v['n']}" for k, v in sorted(stats.items())}
            print(f"[{i+1}/{args.seeds}] {done} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    fp_stats = {"regions": 0, "calls": 0, "regions_with_calls": 0}
    fp_details: list[str] = []
    for i in range(args.fp):
        run_fp_seed(10_000 + args.start_seed + i, fp_stats, fp_details, error_model)
        if (i + 1) % 20 == 0:
            print(f"[fp {i+1}/{args.fp}] {fp_stats} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    recall = {
        kind: {
            "n": v["n"], "ok": v["ok"], "fail": v["fail"],
            "recall": round(v["ok"] / v["n"], 4) if v["n"] else None,
        }
        for kind, v in sorted(stats.items())
    }
    out = {
        "artifact": "accuracy sweep (noisy reads)",
        "seeds": args.seeds,
        "start_seed": args.start_seed,
        "error_model": (error_model or ErrorModel()).__dict__,
        "recall": recall,
        "fp": {
            **fp_stats,
            "fp_rate_per_region": (
                round(fp_stats["calls"] / fp_stats["regions"], 4)
                if fp_stats["regions"] else None
            ),
        },
        "failures_sample": failures[:25],
        "fp_sample": fp_details[:25],
        "wall_s": round(time.time() - t0, 1),
    }
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({k: out[k] for k in ("recall", "fp", "wall_s")}))
    n_fail = sum(v["fail"] for v in stats.values())
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
