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


def _score_windows(
    q_fwd: np.ndarray,
    windows: Sequence[Window],
    window_codes: Sequence[np.ndarray],
    params: SWParams,
):
    """Batched device SW over all candidate windows; returns
    (scores, q_ends, t_ends) — the ends let the host traceback clip its
    DP to the winning cell's prefix."""
    q_rc = revcomp_codes(q_fwd)
    lq = pad_tier(len(q_fwd), (128, 256, 512, 1024))
    lt = pad_tier(max(len(c) for c in window_codes), (256, 512, 1024, 2048))
    B = len(windows)
    qb = np.full((B, lq), 4, dtype=np.int8)
    tb = np.full((B, lt), 4, dtype=np.int8)
    for b, (w, codes) in enumerate(zip(windows, window_codes)):
        qb[b, : len(q_fwd)] = q_fwd if w.strand == "+" else q_rc
        tb[b, : len(codes)] = codes
    return sw_score_batch(qb, tb, params)


def realign_contig(
    contig_codes: np.ndarray,
    region: RegionRef,
    genome: Optional[GenomeIndex] = None,
    params: SWParams = SWParams(),
    max_segments: int = 3,
    min_seg_len: int = 25,
    min_identity: float = 0.90,
    min_seg_score: Optional[int] = None,
    full_hit_cov: float = 0.95,
    max_q_gap: int = 50,
) -> List[AlignSegment]:
    """Iteratively align a contig, masking accepted segments.

    Pass 1 mirrors the reference's blat-vs-region call; if the best region
    alignment does not cover the contig (split contig) the remainder is
    realigned — against the region again AND, when a ``genome`` index is
    given, genome-wide (the gfServer analog) so translocation partners are
    found. Returns segments sorted by forward-contig q_start.
    """
    contig_codes = np.asarray(contig_codes, dtype=np.int8)
    L = len(contig_codes)
    if min_seg_score is None:
        min_seg_score = params.match * min_seg_len // 2

    masked = contig_codes.copy()
    segments: List[AlignSegment] = []

    for _ in range(max_segments):
        if int(np.sum(masked < 4)) < min_seg_len:
            break
        # --- candidate windows --------------------------------------------
        windows: List[Window] = []
        window_codes: List[np.ndarray] = []
        for w in region.index.candidates(masked):
            w2 = Window(w.t_start, w.t_end, w.strand, w.nseeds, chrom=region.chrom)
            windows.append(w2)
            window_codes.append(region.codes[w.t_start : w.t_end])
        n_region_windows = len(windows)
        if genome is not None:
            for w in genome.candidates(masked):
                windows.append(w)
                window_codes.append(genome.fetch_codes(w.chrom, w.t_start, w.t_end))
        if not windows:
            break
        # --- batched device scoring ---------------------------------------
        scores, q_ends, t_ends = _score_windows(
            masked, windows, window_codes, params
        )
        order = np.argsort(-scores, kind="stable")
        best = int(order[0])
        if scores[best] < min_seg_score:
            break
        w = windows[best]
        codes = window_codes[best]
        is_region_window = best < n_region_windows
        # --- host traceback on the winner ---------------------------------
        # the device already located the best cell; the host DP only needs
        # the prefix up to it (exact — no cell beyond the best end can be
        # part of the optimal local alignment, and device/host agree
        # bit-exactly on the best cell)
        q_or = masked if w.strand == "+" else revcomp_codes(masked)
        qe = int(q_ends[best]) + 1
        te = int(t_ends[best]) + 1
        if 0 < qe <= len(q_or) and 0 < te <= len(codes):
            aln_whole = traceback_align(q_or[:qe], codes[:te], params)
        else:
            aln_whole = traceback_align(q_or, codes, params)
        if aln_whole.score <= 0:
            break
        # blat-parity: no giant query gaps inside one segment — split them
        pieces = split_alignment(aln_whole, q_or, codes, params, max_q_gap=max_q_gap)
        made_progress = False
        for aln in pieces:
            # forward-contig coords
            if w.strand == "+":
                fq_start, fq_end = aln.q_start, aln.q_end
            else:
                fq_start, fq_end = L - aln.q_end, L - aln.q_start
            if fq_end - fq_start < min_seg_len and (segments or len(pieces) > 1):
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
            segments.append(seg)
            made_progress = True
            masked = masked.copy()
            masked[fq_start:fq_end] = 4
        if not made_progress:
            break
        # a full-coverage hit (everything masked) needs no further segments
        covered = int(np.sum(masked >= 4))
        if covered >= L or (L - covered) < min_seg_len:
            break
        if len(segments) == 1 and segments[0].query_coverage(L) >= full_hit_cov:
            break

    segments.sort(key=lambda s: (s.q_start, s.q_end))
    return segments
