"""Region scheduler: bucketing regions/reads into fixed-shape batches.

Reference: the region scheduler is runner.run's loop feeding a process
pool one region at a time (SURVEY.md §2 #3, #19). On TPU the unit of
work must be a STATIC-shape tensor, so regions are packed into
[G, R_max, L_max] batches: G regions per device step, each padded to the
batch's read-count and read-length tiers (SURVEY.md §7 hard part 3 —
pad tiers bound recompiles).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

from breakmer_tpu.encode import PAD, ReadBatch, pad_tier


@dataclasses.dataclass
class RegionBatch:
    """G regions packed to one device-step shape.

    reads   [G, R, L] int8  (PAD-filled)
    lengths [G, R]    int32 (0 for padding rows)
    nreads  [G]       int32
    refs    [G, Lref] int8  (PAD-filled)
    ref_lengths [G]   int32
    names   list of G region names
    """

    reads: np.ndarray
    lengths: np.ndarray
    nreads: np.ndarray
    refs: np.ndarray
    ref_lengths: np.ndarray
    names: List[str]

    @property
    def shape_key(self) -> Tuple[int, int, int, int]:
        g, r, l = self.reads.shape
        return (g, r, l, self.refs.shape[1])


def pack_region_batches(
    regions: Sequence[Tuple[str, ReadBatch, np.ndarray]],
    regions_per_batch: int = 8,
    read_count_tiers: Sequence[int] = (64, 128, 256, 512, 1024),
    read_len_tiers: Sequence[int] = (128, 160, 256),
    ref_len_tiers: Sequence[int] = (1024, 2048, 4096, 8192),
) -> List[RegionBatch]:
    """Pack (name, read batch, region ref codes) triples into fixed-shape
    RegionBatches. Regions are grouped by their pad-tier signature so one
    oversized region does not inflate every batch, then chunked to
    ``regions_per_batch`` (G is padded up with empty regions so every
    batch in a group shares a shape)."""
    grouped: Dict[Tuple[int, int, int], List[Tuple[str, ReadBatch, np.ndarray]]] = {}
    for name, batch, ref in regions:
        key = (
            pad_tier(max(1, len(batch)), read_count_tiers),
            pad_tier(max(1, batch.max_len), read_len_tiers),
            pad_tier(max(1, len(ref)), ref_len_tiers),
        )
        grouped.setdefault(key, []).append((name, batch, ref))

    out: List[RegionBatch] = []
    for (R, L, Lref), members in grouped.items():
        for i in range(0, len(members), regions_per_batch):
            chunk = members[i : i + regions_per_batch]
            G = regions_per_batch
            reads = np.full((G, R, L), PAD, dtype=np.int8)
            lengths = np.zeros((G, R), dtype=np.int32)
            nreads = np.zeros((G,), dtype=np.int32)
            refs = np.full((G, Lref), PAD, dtype=np.int8)
            ref_lengths = np.zeros((G,), dtype=np.int32)
            names = []
            for g, (name, batch, ref) in enumerate(chunk):
                r = len(batch)
                reads[g, :r, : batch.max_len] = batch.codes
                lengths[g, :r] = batch.lengths
                nreads[g] = r
                refs[g, : len(ref)] = ref
                ref_lengths[g] = len(ref)
                names.append(name)
            names += [""] * (G - len(chunk))
            out.append(
                RegionBatch(reads, lengths, nreads, refs, ref_lengths, names)
            )
    return out
