#!/usr/bin/env python
"""Genome-index build regression gate (VERDICT r4 weak #5 / next #8).

The 3.1 Gbp cold index build measured 260 s (r3) then 405 s (r4) on
identical code and was written off as host weather — plausibly, but
nothing could prove it. This is the index-build analog of
``bench_panel.py --cpu-check``: a fixed small (100 Mbp) build run
``--runs`` times in ONE process, gated on the MEDIAN against the
committed ``bench_index_baseline.json``. Median-of-3 on an idle host
sits inside ~±10%; the gate threshold is 0.70x so only a real (>=40%)
build-path regression trips it while weather does not.

Usage:
  python tools/bench_index_gate.py --update    # write baseline (idle host)
  python tools/bench_index_gate.py             # gate: exit 1 below 0.70x
NEVER run while another bench/sweep is running (CLAUDE.md trap #6).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from bench_genome_index import gen_chroms, human_like_layout  # noqa: E402
from breakmer_tpu.align.index import GenomeIndex  # noqa: E402

BASELINE = REPO / "bench_index_baseline.json"
TOTAL_BP = 100_000_000
THRESHOLD = 0.70


def one_build() -> float:
    layout = human_like_layout(TOTAL_BP)
    t0 = time.time()
    gi = GenomeIndex(gen_chroms(layout), k=11)
    dt = time.time() - t0
    assert len(gi._positions) > 0
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    times = sorted(one_build() for _ in range(max(1, args.runs)))
    med = times[len(times) // 2]
    result = {
        "total_bp": TOTAL_BP,
        "build_s": round(med, 2),
        "build_s_all": [round(t, 2) for t in times],
        "mbp_per_s": round(TOTAL_BP / 1e6 / med, 1),
    }
    if args.update:
        BASELINE.write_text(json.dumps(result, indent=1) + "\n")
        print(json.dumps({"index_gate": result, "baseline": "written"}))
        return 0
    if not BASELINE.exists():
        print(json.dumps({
            "index_gate": result, "ok": False,
            "error": "bench_index_baseline.json missing — run --update "
                     "on a known-good idle host first"}))
        return 2
    base = json.loads(BASELINE.read_text())
    drift = round(base["build_s"] / med, 3)  # >1 = faster than baseline
    ok = drift >= THRESHOLD
    print(json.dumps({"index_gate": result,
                      "baseline_build_s": base["build_s"],
                      "drift_vs_baseline": drift, "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
