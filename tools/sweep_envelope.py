#!/usr/bin/env python
"""Operating-envelope sweep: recall vs coverage depth x error rate.

The flat accuracy sweep (tools/sweep_accuracy.py, ACCURACY_r03.json)
measures recall 1.0 / FP 0 at the default operating point (25x junction
depth, 0.8% substitutions). This sweep titrates BOTH axes to find where
the caller actually breaks — the honest operating envelope the reference
characterized only anecdotally on panel cohorts (SURVEY.md §4, Abo et al.
NAR 2015 validation):

  * coverage: junction-read tiling step 4..33 (~25x down to ~3x)
  * error rate: mean substitution rate 0.8% (Illumina-like), 2%, 4%

Every cell runs N random seeds of the 4-gene randomized panel (one SV
per gene, random kinds incl. trl) WITH the error model; recall is
per-SV-type planted-truth recovery under the property-test tolerances.

Emits ENVELOPE_r03.json. Usage:
  python tools/sweep_envelope.py [--seeds 16] [--out ENVELOPE_r03.json]
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
from tests.scenarios import build_scenario  # noqa: E402

READ_LEN = 100  # tests/fixtures.SamBuilder default
STEPS = [4, 8, 12, 16, 20, 25, 33]
SUB_RATES = [0.008, 0.02, 0.04]


def run_cell(step: int, sub_rate: float, seeds: int, start_seed: int):
    em = ErrorModel(sub_rate=sub_rate)
    stats = defaultdict(lambda: {"n": 0, "ok": 0})
    fails: list[str] = []
    for i in range(seeds):
        seed = start_seed + i
        work = Path(tempfile.mkdtemp(prefix=f"env{step}_{seed}_"))
        try:
            cfg_kwargs, checks = build_scenario(
                seed, work, n_genes=4, error_model=em, read_step=step,
            )
            runner = Runner(Config(**cfg_kwargs))
            runner.setup()
            events = runner.run()
            for gene, (kind, check) in checks.items():
                evs = [e for e in events if e.genes.split(",")[0] == gene]
                f = check(evs)
                stats[kind]["n"] += 1
                if f:
                    fails.extend(f"seed {seed} {gene}: {x}" for x in f)
                else:
                    stats[kind]["ok"] += 1
        finally:
            shutil.rmtree(work, ignore_errors=True)
    per_kind = {
        k: {"n": v["n"], "ok": v["ok"],
            "recall": round(v["ok"] / v["n"], 4)}
        for k, v in sorted(stats.items())
    }
    tot_n = sum(v["n"] for v in stats.values())
    tot_ok = sum(v["ok"] for v in stats.values())
    return {
        "read_step": step,
        "junction_depth_x": round(READ_LEN / step, 1),
        "sub_rate": sub_rate,
        "recall_overall": round(tot_ok / tot_n, 4),
        "per_kind": per_kind,
        "failures_sample": fails[:6],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=16)
    ap.add_argument("--start-seed", type=int, default=0)
    ap.add_argument("--out", default=str(REPO / "ENVELOPE_r03.json"))
    args = ap.parse_args()

    t0 = time.time()
    cells = []
    for sub in SUB_RATES:
        for step in STEPS:
            cell = run_cell(step, sub, args.seeds, args.start_seed)
            cells.append(cell)
            print(
                f"step={step} (~{cell['junction_depth_x']}x) sub={sub}: "
                f"overall {cell['recall_overall']} "
                f"{ {k: v['recall'] for k, v in cell['per_kind'].items()} } "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
    out = {
        "artifact": "operating envelope: recall vs junction depth x error rate",
        "seeds_per_cell": args.seeds,
        "read_len": READ_LEN,
        "grid": {"read_step": STEPS, "sub_rate": SUB_RATES},
        "cells": cells,
        "wall_s": round(time.time() - t0, 1),
    }
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {args.out} ({time.time()-t0:.0f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
