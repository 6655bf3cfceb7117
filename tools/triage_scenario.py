#!/usr/bin/env python
"""Triage one sweep seed: rerun it and dump per-gene region stats, every
prefilter event (with filter_reason), and the checker verdicts — for
diagnosing repeat-genome sweep failures without re-running the whole
sweep.

Usage: python tools/triage_scenario.py SEED [--genome repeats]
       [--gene G3] [--kinds trl,ins,...]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from breakmer_tpu.config import Config  # noqa: E402
from breakmer_tpu.runner import Runner  # noqa: E402
from tests.fixtures import GenomeModel  # noqa: E402
from tests.scenarios import build_scenario  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("seed", type=int)
    ap.add_argument("--genome", choices=["uniform", "repeats"],
                    default="repeats")
    ap.add_argument("--gene", default=None)
    ap.add_argument("--kinds", default=None,
                    help="comma list forces per-gene SV kinds")
    ap.add_argument("--keep", action="store_true",
                    help="keep the work dir (prints path)")
    args = ap.parse_args()

    work = Path(tempfile.mkdtemp(prefix=f"triage{args.seed}_"))
    gm = GenomeModel() if args.genome == "repeats" else None
    meta: dict = {}
    kinds = args.kinds.split(",") if args.kinds else None
    bs_kwargs = dict(genome_model=gm, meta_out=meta)
    if kinds:
        bs_kwargs["kinds"] = kinds
    else:
        bs_kwargs.update(with_normal_germline=True, multi_sv_gene=True)
    try:
        cfg_kwargs, checks = build_scenario(args.seed, work, n_genes=4,
                                            **bs_kwargs)
        cfg = Config(**{**cfg_kwargs, "keep_intermediates": True})
        runner = Runner(cfg)
        runner.setup()
        events = runner.run()
        m = json.loads((work / "analysis" / "metrics.json").read_text())
        print("junction_mask_dist:", meta.get("junction_mask_dist"))
        for gene, (kind, check) in sorted(checks.items()):
            if args.gene and gene != args.gene:
                continue
            evs = [e for e in events if e.genes.split(",")[0] == gene]
            fails = check(evs)
            rs = m["regions"].get(gene, {})
            print(f"\n== {gene} [{kind}] {'FAIL' if fails else 'ok'}")
            print(f"   stats: {rs}")
            for f in fails:
                print(f"   fail: {f}")
            for res in runner.results:
                if res.target.name != gene:
                    continue
                for ev in res.all_events:
                    segs = [
                        (s.chrom, s.t_start, s.t_end, s.q_span,
                         round(getattr(s, 'repeat_frac', -1.0) or -1.0, 2))
                        for s in (ev.segments or [])
                    ]
                    print(f"   ev: {ev.sv_type}/{ev.sv_subtype} size={ev.size}"
                          f" bp={ev.breakpoints} sr={ev.split_read_count}"
                          f" filt={ev.filter_reason} segs={segs}")
                for c in res.contigs:
                    print(f"   contig len={len(c.seq)} reads={c.nreads}"
                          f" {c.seq[:70]}...")
    finally:
        if args.keep:
            print("\nwork dir kept:", work)
        else:
            shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
