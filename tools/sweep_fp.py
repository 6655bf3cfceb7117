#!/usr/bin/env python
"""Large-N specificity campaign (VERDICT r4 missing #2 / next #1).

The r4 "0 FP" headline rested on a 400-region denominator — bounding the
per-region FP rate only below ~0.75% (95% CI). This campaign runs
thousands of SV-free regions across the adversarial condition grid

    repeats            repeat-rich genome + rmask BED
    repeats_poly       + het/hom germline SNPs and 1-6 bp indels,
                       NO matched normal (every SNP mints novel k-mers)
    repeats_poly_deep  + 3x coverage (read_step 4 ~= 50x/strand: 3x the
                       error k-mers that can chance-pair into contigs)

under BOTH operating profiles:

    default   the shipped thresholds
    tuned     the marginal-sample knobs (sweep_envelope.PROFILES: sr
              thresholds 1, min_kmer_count 1, min_identity 0.85) that
              buy ~10% recall at the 4%-error cliff — exactly the knobs
              that mint FPs, never FP-swept before r5.

Emits ACCURACY_FP_r05.json: per-profile, per-condition FP rates with
Wilson 95% CIs, per-filter fire counts, and full detail for every FP so
each can be triaged to a mechanism.

Usage: python tools/sweep_fp.py [--seeds 170] [--out ACCURACY_FP_r05.json]
  (170 seeds x 4 regions x 3 conditions = 2040 regions per profile)
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from breakmer_tpu.config import Config  # noqa: E402
from breakmer_tpu.runner import Runner  # noqa: E402
from sweep_accuracy import _collect_filters  # noqa: E402
from sweep_envelope import PROFILES  # noqa: E402
from tests.fixtures import ErrorModel, GenomeModel, Polymorphism  # noqa: E402
from tests.scenarios import build_fp_scenario  # noqa: E402

CONDITIONS = {
    "repeats": dict(poly=False, read_step=12),
    "repeats_poly": dict(poly=True, read_step=12),
    "repeats_poly_deep": dict(poly=True, read_step=4),
}


def wilson_ci(k: int, n: int, z: float = 1.959964) -> tuple:
    """Wilson score 95% interval for a binomial proportion."""
    if n == 0:
        return (None, None)
    p = k / n
    z2 = z * z
    denom = 1 + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = z * ((p * (1 - p) / n + z2 / (4 * n * n)) ** 0.5) / denom
    return (round(max(0.0, center - half), 6),
            round(min(1.0, center + half), 6))


def run_campaign(profile: str, seeds: int, start_seed: int, t0: float):
    overrides = PROFILES[profile]
    gm = GenomeModel()
    out = {}
    for cond, spec in CONDITIONS.items():
        poly = Polymorphism() if spec["poly"] else None
        filters: Counter = Counter()
        totals = {"prefilter_events": 0}
        n_regions = 0
        fps = []
        for i in range(seeds):
            # seed space disjoint from the committed r4 sweeps (10_000+)
            # and distinct per condition so panels are independent draws
            seed = 20_000 + start_seed + i
            work = Path(tempfile.mkdtemp(prefix=f"fpc_{cond}_{seed}_"))
            try:
                cfg_kwargs = build_fp_scenario(
                    seed, work, n_genes=4, genome_model=gm,
                    polymorphism=poly, read_step=spec["read_step"],
                )
                cfg_kwargs.update(overrides)
                runner = Runner(Config(**cfg_kwargs))
                runner.setup()
                events = runner.run()
                _collect_filters(cfg_kwargs["analysis_dir"], filters, totals)
                n_regions += 4
                for e in events:
                    fps.append({
                        "profile": profile, "condition": cond, "seed": seed,
                        "gene": e.genes, "sv": f"{e.sv_type}/{e.sv_subtype}",
                        "size": e.size, "breakpoints": e.breakpoints_str(),
                        "sr": e.split_read_count,
                        "disc": e.disc_read_count,
                        "contig": e.contig_seq,
                    })
            finally:
                shutil.rmtree(work, ignore_errors=True)
            if (i + 1) % 25 == 0:
                print(f"[{profile}/{cond} {i+1}/{seeds}] "
                      f"regions={n_regions} fps={len(fps)} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        lo, hi = wilson_ci(len(fps), n_regions)
        out[cond] = {
            "regions": n_regions,
            "fp_calls": len(fps),
            "fp_rate_per_region": (round(len(fps) / n_regions, 6)
                                   if n_regions else None),
            "fp_rate_ci95": [lo, hi],
            "filters": {**totals, "fired": dict(filters.most_common())},
            "fp_detail": fps,
        }
        print(json.dumps({"profile": profile, "condition": cond,
                          "regions": n_regions, "fp": len(fps),
                          "ci95": [lo, hi]}), flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=170,
                    help="seeds per condition (x4 regions x3 conditions)")
    ap.add_argument("--start-seed", type=int, default=0)
    ap.add_argument("--profiles", nargs="+", default=["default", "tuned"],
                    choices=sorted(PROFILES))
    ap.add_argument("--out", default=str(REPO / "ACCURACY_FP_r05.json"))
    args = ap.parse_args()
    t0 = time.time()
    per_profile = {}
    for profile in args.profiles:
        per_profile[profile] = run_campaign(profile, args.seeds,
                                            args.start_seed, t0)
    summary = {
        p: {
            "regions": sum(c["regions"] for c in conds.values()),
            "fp_calls": sum(c["fp_calls"] for c in conds.values()),
            "fp_rate_ci95": list(wilson_ci(
                sum(c["fp_calls"] for c in conds.values()),
                sum(c["regions"] for c in conds.values()))),
        }
        for p, conds in per_profile.items()
    }
    out = {
        "artifact": "large-N specificity campaign: SV-free regions across "
                    "repeats x polymorphism x deep coverage, default AND "
                    "tuned profiles, Wilson 95% CIs",
        "seeds_per_condition": args.seeds,
        "conditions": {k: dict(v) for k, v in CONDITIONS.items()},
        "profile_overrides": {p: PROFILES[p] for p in args.profiles},
        "error_model": ErrorModel().__dict__,
        "genome_model": GenomeModel().__dict__,
        "polymorphism": Polymorphism().__dict__,
        "summary": summary,
        "per_profile": per_profile,
        "wall_s": round(time.time() - t0, 1),
    }
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({"summary": summary, "wall_s": out["wall_s"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
