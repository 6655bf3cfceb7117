"""Panel throughput scaling sweep: regions/s and reads/s vs panel size.

BASELINE.md asks for "regions/s, reads/s at 1 chip" (BASELINE.json:2) —
the single-size panel bench (bench_panel.py) reports one point; this
sweep measures the amortization curve across panel sizes plus one
deep-coverage point (read_step=2 → ~3x the reads), emitting
SCALING_r0N.json for the round record.

Method notes (CLAUDE.md timing traps): each size runs once cold (compile
+ relay cache) and twice warm; the reported number is the MEDIAN warm of
the two, and cold_s is recorded but environmental (the relay's
server-side compile cache is erratic). Run on an otherwise idle host.

Usage: python tools/bench_panel_scaling.py [out.json]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench_panel import build_panel, run_once  # noqa: E402

SIZES = [20, 50, 100, 200, 400]
DEEP = (100, 2)  # (n_genes, read_step): ~3x records of the default step 6


def one_point(n_genes: int, read_step: int) -> dict:
    work = Path(tempfile.mkdtemp(prefix="breakmer_scale_"))
    try:
        t0 = time.time()
        cfg = build_panel(work, n_genes, read_step)
        fixture_s = time.time() - t0
        cold = run_once(cfg)
        warms = []
        for _ in range(2):
            shutil.rmtree(cfg.analysis_dir, ignore_errors=True)
            warms.append(run_once(cfg))
        warm = sorted(warms, key=lambda w: w["elapsed_s"])[len(warms) // 2]
        return {
            "n_genes": n_genes,
            "read_step": read_step,
            "targets": warm["targets"],
            "records": warm["records"],
            "calls": warm["calls"],
            "fixture_s": round(fixture_s, 2),
            "cold_s": round(cold["elapsed_s"], 2),
            "warm_s": round(warm["elapsed_s"], 3),
            "warm_s_all": [round(w["elapsed_s"], 3) for w in warms],
            "regions_per_s": round(warm["targets"] / warm["elapsed_s"], 1),
            "reads_per_s": round(warm["records"] / warm["elapsed_s"], 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else None
    from breakmer_tpu.device import configure

    platform = configure("auto")
    points = [one_point(n, 6) for n in SIZES]
    deep = one_point(*DEEP)
    artifact = {
        "metric": "panel_scaling",
        "platform": platform,
        "points": points,
        "deep_coverage": deep,
        "note": (
            "warm_s is the comparable number (median of 2 same-process "
            "warm runs); cold_s is relay-environmental. reads/s counts "
            "ingested records of the warm run."
        ),
    }
    line = json.dumps(artifact)
    print(line)
    if out_path is not None:
        out_path.write_text(line + "\n")


if __name__ == "__main__":
    main()
