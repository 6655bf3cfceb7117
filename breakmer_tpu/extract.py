"""SV-informative read extraction and cleaning.

Reference: sv_processor.py target.extract_bam_reads (SURVEY.md §2 #6) —
pysam fetch over the region keeping reads that are soft-clipped (clip
length and clip base-quality thresholds), unmapped-with-mapped-mate,
mate-unmapped, or discordant (mate on another chrom / abnormal insert /
abnormal orientation), writing an sv-reads fastq and recording discordant
pairs keyed by mate chrom; plus target.clean_reads (SURVEY.md §2 #8) which
shells out to cutadapt.

Here extraction consumes parsed alignment records (io.sam / io.bam) and
produces a packed ReadBatch + DiscordantPairs + a region coverage array
directly — no fastq round-trip. Cleaning is a vectorized quality trim
(the cutadapt-config subset the reference pipeline actually used: quality
trimming + minimum length).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Tuple

import numpy as np

from breakmer_tpu.call.support import DiscordantPairs
from breakmer_tpu.config import Config
from breakmer_tpu.encode import ReadBatch
from breakmer_tpu.io.sam import SamRecord


@dataclasses.dataclass
class ExtractResult:
    batch: ReadBatch              # SV-informative reads (packed)
    disc: DiscordantPairs
    coverage: np.ndarray          # depth over [region_start, region_end)
    region_start: int
    n_records: int                # records scanned
    n_sv_reads: int

    def coverage_at(self, chrom: str, pos: int) -> int:
        i = pos - self.region_start
        if 0 <= i < len(self.coverage):
            return int(self.coverage[i])
        return 0


def _clip_quals_ok(rec: SamRecord, side: str, clip_len: int, min_qual: float) -> bool:
    if not rec.qual:
        return True
    if side == "left":
        seg = rec.qual[:clip_len]
    else:
        seg = rec.qual[-clip_len:]
    return (sum(seg) / len(seg)) >= min_qual if seg else True


def is_sv_informative(rec: SamRecord, cfg: Config) -> Tuple[bool, Optional[str]]:
    """(keep, reason). Reasons: softclip / unmapped / mate_unmapped /
    discordant. Mirrors the reference's keep-classes (SURVEY.md §2 #6)."""
    if rec.is_secondary or rec.is_supplementary or rec.is_dup:
        return False, None
    if rec.is_unmapped:
        return True, "unmapped"
    left, right = rec.soft_clips()
    if left >= cfg.min_clip_len and _clip_quals_ok(rec, "left", left, cfg.min_clip_qual):
        return True, "softclip"
    if right >= cfg.min_clip_len and _clip_quals_ok(rec, "right", right, cfg.min_clip_qual):
        return True, "softclip"
    if rec.is_paired and rec.mate_unmapped:
        return True, "mate_unmapped"
    if rec.is_paired and not rec.mate_unmapped:
        if rec.rnext != rec.rname:
            return True, "discordant"
        if abs(rec.tlen) > cfg.insert_size_thresh:
            return True, "discordant"
        if rec.is_reverse == rec.mate_reverse:
            return True, "discordant"
    return False, None


def extract_sv_reads(
    records: Iterable[SamRecord],
    region: Tuple[str, int, int],
    cfg: Config,
) -> ExtractResult:
    """One pass over region records: classify, pack, count coverage."""
    chrom, start, end = region
    cov = np.zeros(max(1, end - start), dtype=np.int32)
    seqs: List[str] = []
    names: List[str] = []
    quals: List[List[int]] = []
    disc = DiscordantPairs()
    n_records = 0
    seen_names = set()
    for rec in records:
        n_records += 1
        if not rec.is_unmapped and not rec.is_secondary and not rec.is_supplementary:
            lo = max(0, rec.pos - start)
            hi = min(end - start, rec.reference_end() - start)
            if hi > lo:
                cov[lo:hi] += 1
        keep, reason = is_sv_informative(rec, cfg)
        if not keep:
            continue
        if reason == "discordant":
            disc.add(rec.rname, rec.pos, rec.rnext, rec.pnext)
        # unique name per mate (reference appends /1 /2 from flags)
        mate_tag = "/2" if rec.flag & 0x80 else "/1"
        name = rec.qname + mate_tag
        if name in seen_names or not rec.seq or rec.seq == "*":
            continue
        seen_names.add(name)
        seqs.append(rec.seq)
        names.append(name)
        quals.append(rec.qual if rec.qual else [40] * len(rec.seq))
    batch = (
        ReadBatch.from_seqs(seqs, names=names, quals=quals)
        if seqs
        else ReadBatch.from_seqs([])
    )
    return ExtractResult(
        batch=batch,
        disc=disc,
        coverage=cov,
        region_start=start,
        n_records=n_records,
        n_sv_reads=len(seqs),
    )


def clean_reads(
    batch: ReadBatch,
    trim_qual: int = 3,
    min_len: int = 25,
) -> ReadBatch:
    """Quality-trim read ends and drop short reads (the cutadapt step,
    reference: target.clean_reads). Trims the maximal low-quality suffix/
    prefix using cutadapt's partial-sum algorithm, vectorized per read."""
    if len(batch) == 0 or batch.quals is None:
        return batch
    keep_seqs: List[str] = []
    keep_names: List[str] = []
    keep_quals: List[List[int]] = []
    for i in range(len(batch)):
        length = int(batch.lengths[i])
        q = batch.quals[i, :length].astype(np.int32)
        # cutadapt algorithm: trim from 3' end where running sum of
        # (trim_qual - q) is maximal
        deltas = trim_qual - q[::-1]
        sums = np.cumsum(deltas)
        cut3 = 0
        if sums.size and sums.max() > 0:
            cut3 = int(np.argmax(sums)) + 1
        deltas5 = trim_qual - q
        sums5 = np.cumsum(deltas5)
        cut5 = 0
        if sums5.size and sums5.max() > 0:
            cut5 = int(np.argmax(sums5)) + 1
        lo, hi = cut5, length - cut3
        if hi - lo < min_len:
            continue
        keep_seqs.append(batch.seq(i)[lo:hi])
        keep_names.append(batch.names[i])
        keep_quals.append([int(x) for x in batch.quals[i, lo:hi]])
    return ReadBatch.from_seqs(keep_seqs, names=keep_names, quals=keep_quals)
