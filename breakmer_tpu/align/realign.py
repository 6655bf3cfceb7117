"""Seed-and-extend realignment driver: the blat/gfClient replacement.

Reference flow being replaced (SURVEY.md §3.3): per contig, the reference
writes a fasta, runs ``blat`` vs the region reference, falls back to
``gfClient`` -> ``gfServer`` (whole genome) when there is no clean
full-length hit, and parses PSL rows into ``blat_res`` objects; top-scoring
rows covering disjoint contig intervals become the split segments of an SV
event (reference: sv_caller.py ~1-800).

Here: candidate windows come from SeedIndex/GenomeIndex diagonal
clustering; all (contig, window) pairs are scored in one batched device SW
call (ops.sw — wavefront kernel); only winners get a host traceback.
Disjoint multi-segment discovery is iterative query masking: after a
segment is accepted, its contig interval is masked to N and the remainder
is realigned — deterministic, and uniform across deletion / duplication /
inversion / translocation shapes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from breakmer_tpu.align.index import GenomeIndex, SeedIndex, Window
from breakmer_tpu.align.traceback import Alignment, split_alignment, traceback_align
from breakmer_tpu.encode import pad_tier, revcomp_codes
from breakmer_tpu.ops.sw import SWParams, sw_score_batch


@dataclasses.dataclass
class RegionRef:
    """The cached target-region reference (reference: utils.py
    extract_refseq_fa + target.set_ref_data): chrom, genomic start of the
    buffered region, base codes, and a seed index built once per region."""

    chrom: str
    start: int            # genomic coordinate of codes[0]
    codes: np.ndarray
    index: SeedIndex

    @classmethod
    def build(cls, chrom: str, start: int, codes: np.ndarray, seed_k: int = 11) -> "RegionRef":
        return cls(chrom=chrom, start=start, codes=np.asarray(codes, dtype=np.int8),
                   index=SeedIndex(codes, seed_k))


@dataclasses.dataclass
class AlignSegment:
    """One aligned contig segment in genomic coordinates — the blat_res
    equivalent (reference: sv_caller.py class blat_res, SURVEY.md §2 #12).

    q_start/q_end are FORWARD-contig coordinates (half-open) regardless of
    strand, so disjointness logic works across strands; t_start/t_end are
    genomic (half-open) on ``chrom``.
    """

    q_start: int
    q_end: int
    chrom: str
    t_start: int
    t_end: int
    strand: str
    score: int
    matches: int
    mismatches: int
    alignment: Alignment        # window-local, strand-oriented query coords
    in_target: bool = True
    repeat_frac: float = 0.0    # filled by the filter stack

    @property
    def identity(self) -> float:
        aligned = self.matches + self.mismatches
        return self.matches / aligned if aligned else 0.0

    @property
    def q_span(self) -> int:
        return self.q_end - self.q_start

    def query_coverage(self, contig_len: int) -> float:
        return self.q_span / contig_len if contig_len else 0.0


@dataclasses.dataclass
class _Work:
    """Per-contig state across masked-requery rounds."""

    masked: np.ndarray
    region: RegionRef
    segments: List[AlignSegment]
    done: bool = False
    # reference two-pass structure (SURVEY.md §3.3): pass 1 is blat vs the
    # region only; the whole-genome index (gfServer analog) joins from the
    # second pass, or immediately when the region yields no candidates
    use_genome: bool = False
    # per-round candidate set (filled by _gather)
    windows: List[Window] = dataclasses.field(default_factory=list)
    window_codes: List[np.ndarray] = dataclasses.field(default_factory=list)
    n_region_windows: int = 0


def _gather(work: _Work, genome: Optional[GenomeIndex]) -> bool:
    """Collect this round's candidate windows for one contig."""
    region = work.region
    work.windows = []
    work.window_codes = []
    for w in region.index.candidates(work.masked):
        work.windows.append(
            Window(w.t_start, w.t_end, w.strand, w.nseeds, chrom=region.chrom)
        )
        work.window_codes.append(region.codes[w.t_start : w.t_end])
    work.n_region_windows = len(work.windows)
    if genome is not None:
        for w in genome.candidates(work.masked):
            work.windows.append(w)
            work.window_codes.append(
                genome.fetch_codes(w.chrom, w.t_start, w.t_end)
            )
    return bool(work.windows)


def _process_winner(
    work: _Work,
    best: int,
    score: int,
    q_end: int,
    t_end: int,
    params: SWParams,
    min_seg_len: int,
    min_identity: float,
    min_seg_score: int,
    full_hit_cov: float,
    max_q_gap: int,
) -> None:
    """Host traceback + accept/mask for one contig's round winner;
    updates work in place (sets done when no further rounds are useful)."""
    L = len(work.masked)
    region = work.region
    w = work.windows[best]
    codes = work.window_codes[best]
    is_region_window = best < work.n_region_windows
    # the device already located the best cell; the host DP only needs the
    # prefix up to it (exact — device/host agree bit-exactly)
    q_or = work.masked if w.strand == "+" else revcomp_codes(work.masked)
    qe = q_end + 1
    te = t_end + 1
    if 0 < qe <= len(q_or) and 0 < te <= len(codes):
        aln_whole = traceback_align(q_or[:qe], codes[:te], params)
    else:
        aln_whole = traceback_align(q_or, codes, params)
    if aln_whole.score <= 0:
        work.done = True
        return
    # blat-parity: no giant query gaps inside one segment — split them
    pieces = split_alignment(aln_whole, q_or, codes, params, max_q_gap=max_q_gap)
    made_progress = False
    for aln in pieces:
        if w.strand == "+":
            fq_start, fq_end = aln.q_start, aln.q_end
        else:
            fq_start, fq_end = L - aln.q_end, L - aln.q_start
        if fq_end - fq_start < min_seg_len and (work.segments or len(pieces) > 1):
            continue
        genomic_off = (region.start if is_region_window else 0) + w.t_start
        seg = AlignSegment(
            q_start=fq_start,
            q_end=fq_end,
            chrom=w.chrom or region.chrom,
            t_start=genomic_off + aln.t_start,
            t_end=genomic_off + aln.t_end,
            strand=w.strand,
            score=aln.score,
            matches=aln.matches,
            mismatches=aln.mismatches,
            alignment=aln,
            in_target=is_region_window,
        )
        if seg.identity < min_identity:
            continue
        work.segments.append(seg)
        made_progress = True
        work.masked = work.masked.copy()
        work.masked[fq_start:fq_end] = 4
    if not made_progress:
        work.done = True
        return
    covered = int(np.sum(work.masked >= 4))
    if covered >= L or (L - covered) < min_seg_len:
        work.done = True
        return
    if (
        len(work.segments) == 1
        and work.segments[0].query_coverage(L) >= full_hit_cov
    ):
        work.done = True


def realign_contigs(
    contigs: Sequence[Tuple[np.ndarray, RegionRef]],
    genome: Optional[GenomeIndex] = None,
    params: SWParams = SWParams(),
    max_segments: int = 3,
    min_seg_len: int = 25,
    min_identity: float = 0.90,
    min_seg_score: Optional[int] = None,
    full_hit_cov: float = 0.95,
    max_q_gap: int = 50,
) -> List[List[AlignSegment]]:
    """Iteratively align MANY contigs, masking accepted segments — all
    contigs advance in lockstep rounds and every round's SW scoring of
    every (contig, candidate-window) pair across all contigs (and all
    regions, in the panel-batched runner) is ONE device launch. On the
    TPU relay each launch costs tens of ms of dispatch latency, so
    per-contig launches dominated panel wall time.

    Per-contig semantics are identical to the serial loop (the reference
    flow, SURVEY.md §3.3: blat-vs-region, genome fallback, greedy
    disjoint segments via query masking); results are byte-identical.
    """
    from breakmer_tpu.utils.meter import METER

    if min_seg_score is None:
        min_seg_score = params.match * min_seg_len // 2
    with METER.stage("realign"):
        return _realign_contigs(
            contigs, genome, params, max_segments, min_seg_len, min_identity,
            min_seg_score, full_hit_cov, max_q_gap,
        )


def _realign_contigs(
    contigs, genome, params, max_segments, min_seg_len, min_identity,
    min_seg_score, full_hit_cov, max_q_gap,
) -> List[List[AlignSegment]]:
    works = [
        _Work(np.asarray(codes, dtype=np.int8).copy(), region, [])
        for codes, region in contigs
    ]
    # bound: max_segments acceptance rounds + possible genome-retry rounds
    for _round in range(2 * max_segments + 1):
        active = [
            wk for wk in works
            if not wk.done
            and len(wk.segments) < max_segments
            and int(np.sum(wk.masked < 4)) >= min_seg_len
        ]
        for wk in active:
            gathered = _gather(wk, genome if wk.use_genome else None)
            if not gathered and not wk.use_genome and genome is not None:
                # region pass empty -> go genome-wide right away
                wk.use_genome = True
                gathered = _gather(wk, genome)
            if not gathered:
                wk.done = True
        active = [wk for wk in active if not wk.done]
        if not active:
            break
        # ---- ONE flat device launch over every candidate pair ------------
        flat_q: List[np.ndarray] = []
        flat_t: List[np.ndarray] = []
        spans: List[Tuple[int, int]] = []  # (start, count) per work item
        for wk in active:
            q_rc = revcomp_codes(wk.masked)
            spans.append((len(flat_q), len(wk.windows)))
            for w, codes in zip(wk.windows, wk.window_codes):
                flat_q.append(wk.masked if w.strand == "+" else q_rc)
                flat_t.append(codes)
        lq = pad_tier(max(len(q) for q in flat_q), (128, 256, 512, 1024))
        lt = pad_tier(max(len(t) for t in flat_t), (256, 512, 1024, 2048))
        B = len(flat_q)
        qb = np.full((B, lq), 4, dtype=np.int8)
        tb = np.full((B, lt), 4, dtype=np.int8)
        for b in range(B):
            qb[b, : len(flat_q[b])] = flat_q[b]
            tb[b, : len(flat_t[b])] = flat_t[b]
        # round 1 (no masked intervals, N-free contigs/windows) qualifies
        # for the kernel's cheap-substitution path; masked-requery rounds
        # have mid-sequence 4s and take the generic path
        no_n = all(int(a.max(initial=0)) < 4 for a in flat_q) and all(
            int(a.max(initial=0)) < 4 for a in flat_t
        )
        scores, q_ends, t_ends = sw_score_batch(qb, tb, params, no_n=no_n)
        # ---- per-contig winner processing (host) --------------------------
        for wk, (start, count) in zip(active, spans):
            sl = slice(start, start + count)
            local = np.argsort(-scores[sl], kind="stable")
            best = int(local[0])
            if int(scores[sl][best]) < min_seg_score:
                if genome is not None and not wk.use_genome:
                    wk.use_genome = True  # retry genome-wide next round
                else:
                    wk.done = True
                continue
            _process_winner(
                wk, best, int(scores[sl][best]),
                int(q_ends[sl][best]), int(t_ends[sl][best]),
                params, min_seg_len, min_identity, min_seg_score,
                full_hit_cov, max_q_gap,
            )
            # pass 2 and later consult the genome (reference gfClient leg)
            wk.use_genome = genome is not None
    out = []
    for wk in works:
        wk.segments.sort(key=lambda s: (s.q_start, s.q_end))
        out.append(wk.segments)
    return out


def realign_contig(
    contig_codes: np.ndarray,
    region: RegionRef,
    genome: Optional[GenomeIndex] = None,
    params: SWParams = SWParams(),
    **kw,
) -> List[AlignSegment]:
    """Single-contig convenience wrapper over :func:`realign_contigs`
    (one shared implementation — see there for the algorithm)."""
    return realign_contigs(
        [(contig_codes, region)], genome=genome, params=params, **kw
    )[0]
