#!/usr/bin/env python
"""Prove or break the tandem 'information floor' (VERDICT r4 next #2).

The repeats sweep reports tandem-junction recall ~0.77, documented as a
VNTR representation limit: SW absorbs the event size into repeat units,
so no alignment of the alt contig against the reference can express the
planted call. Until r5 that was a hypothesis. This oracle tests it
directly: for every failing gene in the repeats sweep, inject the TRUE
alt haplotype (tests/scenarios stashes it on each checker as
``check.alt_haps``) as a PERFECT contig — no reads, no assembly, no
consensus errors — straight into realign + classify + filters, and
re-run the same planted-truth checker on the result.

Outcome classes per miss:
  floor                 checker still fails on the perfect contig's
                        calls: the call cannot be EXPRESSED through
                        alignment in this region — representation limit
                        proven for this miss
  recoverable           checker passes: the loss happened upstream
                        (read errors -> assembly/consensus) — pipeline
                        improvement could recover it
  filtered              expressible by realign+call but killed by the
                        filter stack (reasons recorded): an operating-
                        point loss, not a representation limit

Emits TANDEM_FLOOR_r05.json with the split by junction context (tandem
vs other) and per-miss detail. Usage:
  python tools/tandem_floor.py [--seeds 400] [--out TANDEM_FLOOR_r05.json]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from collections import Counter, defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from breakmer_tpu.config import Config  # noqa: E402
from breakmer_tpu.runner import Runner  # noqa: E402
from sweep_accuracy import _junction_context  # noqa: E402
from tests.fixtures import GenomeModel  # noqa: E402
from tests.scenarios import build_scenario  # noqa: E402

READ_LEN = 100


def perfect_contigs(check, gene: str):
    """The true alt haplotype over the read-tiled window, as Contig
    objects with fabricated dense read tiling (support counts are not
    the question the oracle asks — expressibility is)."""
    from breakmer_tpu.assemble.greedy import Contig, ContigRead

    out = []
    for ci, (hap, (w0, w1)) in enumerate(getattr(check, "alt_haps", [])):
        lo = max(0, w0)
        hi = min(len(hap.seq), w1 + READ_LEN)
        seq = hap.seq[lo:hi]
        reads = [
            ContigRead(name=f"oracle{ci}_{i}", index=i, offset=off,
                       length=min(READ_LEN, len(seq) - off))
            for i, off in enumerate(range(0, max(1, len(seq) - READ_LEN + 1), 4))
        ]
        out.append(Contig(id=f"{gene}_oracle{ci}", seq=seq, reads=reads,
                          kmers=[]))
    return out


def run_oracle(runner: Runner, gene: str, check) -> tuple:
    """(outcome, detail): re-run realign+classify+filters on the perfect
    contigs and apply the planted-truth checker."""
    from breakmer_tpu.align.realign import realign_contigs
    from breakmer_tpu.call.events import classify_contig
    from breakmer_tpu.call.filters import apply_filters
    from breakmer_tpu.encode import encode_seq
    from breakmer_tpu.pipeline import TargetPipeline, _dedup_identical

    cfg = runner.cfg
    target = runner.targets[gene]
    region_ref = runner.region_ref(target)
    pipe = TargetPipeline(cfg, target, region_ref, genome=runner.genome,
                          rmask=runner.rmask)
    contigs = perfect_contigs(check, gene)
    if not contigs:
        return "no_oracle", {"note": "checker carries no alt_haps"}
    segs_per = realign_contigs(
        [(encode_seq(c.seq), region_ref) for c in contigs],
        genome=runner.genome, params=pipe.sw_params(), **pipe.realign_opts(),
    )
    all_events = []
    for contig, segs in zip(contigs, segs_per):
        if segs:
            all_events.extend(classify_contig(
                contig, segs, gene, cfg,
                coverage_at=lambda c, p: 50,
            ))
    passed = apply_filters(all_events, cfg, rmask=runner.rmask,
                           target=target)
    if cfg.dedup_identical_events:
        passed = _dedup_identical(passed)
    fails_filtered = check(passed)
    if not fails_filtered:
        return "recoverable", {
            "calls": [(e.sv_type, e.sv_subtype, e.size) for e in passed]}
    # expressible but filtered?
    fails_unfiltered = check(all_events)
    if not fails_unfiltered:
        reasons = [e.filter_reason for e in all_events if e.filter_reason]
        return "filtered", {"filter_reasons": reasons}
    return "floor", {
        "checker": fails_filtered[:2],
        "perfect_contig_calls": [
            (e.sv_type, e.sv_subtype, e.size,
             [bp[1] for bp in e.breakpoints]) for e in all_events],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=400)
    ap.add_argument("--start-seed", type=int, default=0)
    ap.add_argument("--out", default=str(REPO / "TANDEM_FLOOR_r05.json"))
    args = ap.parse_args()
    t0 = time.time()
    gm = GenomeModel()
    outcomes = defaultdict(Counter)  # context -> outcome counts
    misses = []
    n_checked = 0
    for i in range(args.seeds):
        seed = args.start_seed + i
        work = Path(tempfile.mkdtemp(prefix=f"floor{seed}_"))
        try:
            meta: dict = {}
            cfg_kwargs, checks = build_scenario(
                seed, work, n_genes=4, with_normal_germline=True,
                multi_sv_gene=True, genome_model=gm, meta_out=meta,
            )
            runner = Runner(Config(**cfg_kwargs))
            runner.setup()
            events = runner.run()
            rmask = runner.rmask
            for gene, (kind, check) in checks.items():
                if kind == "germline":
                    continue
                evs = [e for e in events if e.genes.split(",")[0] == gene]
                fails = check(evs)
                n_checked += 1
                if not fails:
                    continue
                ctx = _junction_context(
                    meta.get("junction_mask_dist", {}).get(gene, []))
                outcome, detail = run_oracle(runner, gene, check)
                outcomes[ctx][outcome] += 1
                # the enclosing repeat feature's span: a tandem array
                # longer than the read length is a READ-level floor —
                # no 100 bp molecule can count its units (r5: every
                # proven-floor tandem case sat in a 201-298 bp array)
                feat_lens = []
                if rmask is not None:
                    for c, p in getattr(check, "junctions", []):
                        starts = rmask._starts.get(c)
                        if starts is None:
                            continue
                        ends = rmask._ends[c]
                        for s, e in zip(starts.tolist(), ends.tolist()):
                            if s - 25 <= p < e + 25:
                                feat_lens.append(e - s)
                misses.append({
                    "seed": seed, "gene": gene, "kind": kind,
                    "context": ctx, "outcome": outcome,
                    "junction_feature_span": max(feat_lens, default=None),
                    "pipeline_failure": fails[0][:200], **detail,
                })
        finally:
            shutil.rmtree(work, ignore_errors=True)
        if (i + 1) % 25 == 0:
            print(f"[{i+1}/{args.seeds}] misses={len(misses)} "
                  f"{dict((c, dict(o)) for c, o in outcomes.items())} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    by_ctx = {
        ctx: {"total": sum(o.values()), **dict(o.most_common())}
        for ctx, o in sorted(outcomes.items())
    }
    out = {
        "artifact": "true-alt-haplotype oracle: every repeats-sweep miss "
                    "re-driven with a PERFECT contig through "
                    "realign+classify+filters — floor (inexpressible) vs "
                    "recoverable (assembly loss) vs filtered",
        "seeds": args.seeds,
        "start_seed": args.start_seed,
        "genome_model": gm.__dict__,
        "planted_checked": n_checked,
        "misses": len(misses),
        "outcomes_by_context": by_ctx,
        "miss_detail": misses,
        "wall_s": round(time.time() - t0, 1),
    }
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({"outcomes_by_context": by_ctx,
                      "wall_s": out["wall_s"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
