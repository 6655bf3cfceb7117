"""Seed k-mer indexes for realignment candidate generation.

Replaces BLAT's tile index and the resident gfServer whole-genome index
(reference: sv_caller.py blat/gfclient runners + runner.start_blat_server,
SURVEY.md §2 #11): a sorted-array k-mer -> positions index, one per target
region (SeedIndex) and one genome-wide (GenomeIndex, chrom-concatenated
with an offset table). Lookups are vectorized numpy binary searches; there
is no socket hop and no subprocess. The genome index is built once and
replicated per host (SURVEY.md §2b "index sharding"; chromosome-sharded
variant is the parallel/ package's concern).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from breakmer_tpu.encode import encode_seq, revcomp_codes


def _seed_codes(codes: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """(codes, positions) of all valid k-mers in a base-code array (host,
    vectorized rolling evaluation)."""
    codes = np.asarray(codes, dtype=np.int64)
    n = len(codes) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    acc = np.zeros(n, dtype=np.int64)
    bad = np.zeros(n, dtype=bool)
    for j in range(k):
        w = codes[j : j + n]
        bad |= w >= 4
        acc = (acc << 2) | np.where(w >= 4, 0, w)
    pos = np.nonzero(~bad)[0]
    return acc[pos], pos


@dataclasses.dataclass
class Window:
    """A candidate target window for SW scoring."""

    t_start: int
    t_end: int
    strand: str          # '+': query as-is; '-': revcomp(query) vs window
    nseeds: int
    chrom: Optional[str] = None   # set by GenomeIndex candidates


class SeedIndex:
    """Sorted k-mer index over one target sequence.

    ``step`` indexes every step-th position only — BLAT's gfServer tiles
    the genome with non-overlapping k-mers (stepSize == tileSize), which
    divides genome index memory by k while queries (which scan every
    query k-mer) still hit every tile (SURVEY.md §2a gfServer row).
    ``max_hits_per_seed`` drops pathologically repetitive seeds, the
    analog of BLAT's repMatch/maxHits guard.
    """

    def __init__(self, codes: np.ndarray, k: int, step: int = 1,
                 max_hits_per_seed: int = 64):
        self.k = k
        self.step = step
        self.max_hits_per_seed = max_hits_per_seed
        self.length = len(codes)
        seed_codes, positions = _seed_codes(codes, k)
        if step > 1:
            keep = positions % step == 0
            seed_codes, positions = seed_codes[keep], positions[keep]
        order = np.argsort(seed_codes, kind="stable")
        seed_codes = seed_codes[order]
        positions = positions[order]
        if max_hits_per_seed > 0 and len(seed_codes):
            # rank of each entry within its (sorted) code run; cap the run
            starts = np.r_[True, seed_codes[1:] != seed_codes[:-1]]
            run_ids = np.cumsum(starts) - 1
            run_first_idx = np.nonzero(starts)[0]
            rank = np.arange(len(seed_codes)) - run_first_idx[run_ids]
            keep = rank < max_hits_per_seed
            seed_codes, positions = seed_codes[keep], positions[keep]
        self._codes = seed_codes
        self._pos = positions

    def lookup(self, code: int) -> np.ndarray:
        lo = np.searchsorted(self._codes, code, side="left")
        hi = np.searchsorted(self._codes, code, side="right")
        return self._pos[lo:hi]

    def hits(self, query_codes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """All (query_pos, target_pos) seed hits for a query sequence."""
        q_codes, q_pos = _seed_codes(query_codes, self.k)
        lo = np.searchsorted(self._codes, q_codes, side="left")
        hi = np.searchsorted(self._codes, q_codes, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        qp = np.repeat(q_pos, counts)
        # flatten ranges [lo_i, hi_i) into one index vector
        idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi) if h > l])
        return qp, self._pos[idx]

    def candidates(
        self,
        query_codes: np.ndarray,
        band: int = 48,
        pad: int = 96,
        max_windows: int = 8,
        min_seeds: int = 2,
    ) -> List[Window]:
        """Diagonal-cluster seed hits into candidate windows, both strands.

        Hits are grouped by diagonal (t_pos - q_pos) bands; each cluster
        becomes a window [min_diag - pad, max_diag + len(query) + pad]
        clipped to the target. Windows are ranked by seed count. This is
        the blat-equivalent seed stage (SURVEY.md §7 layer 4).
        """
        L = len(query_codes)
        hits_by_strand = [
            ("+", *self.hits(query_codes)),
            ("-", *self.hits(revcomp_codes(query_codes))),
        ]
        return cluster_candidates(
            hits_by_strand, self.length, L, band, pad, max_windows, min_seeds
        )


def cluster_candidates(
    hits_by_strand,
    target_length: int,
    L: int,
    band: int = 48,
    pad: int = 96,
    max_windows: int = 8,
    min_seeds: int = 2,
) -> List[Window]:
    """Shared clustering core (SeedIndex AND the mesh-sharded index use
    this exact code path, so their candidate windows are identical by
    construction). ``hits_by_strand``: [(strand, q_pos[], t_pos[])] with
    hits ordered (q_pos asc, then table run order)."""
    out: List[Window] = []
    for strand, qp, tp in hits_by_strand:
        if len(qp) == 0:
            continue
        diag = np.asarray(tp) - np.asarray(qp)
        order = np.argsort(diag, kind="stable")
        diag = diag[order]
        # cluster: split where diagonal jumps by more than `band`
        splits = np.nonzero(np.diff(diag) > band)[0] + 1
        for grp in np.split(np.arange(len(diag)), splits):
            if len(grp) < min_seeds:
                continue
            d_lo = int(diag[grp[0]])
            d_hi = int(diag[grp[-1]])
            t_start = max(0, d_lo - pad)
            t_end = min(target_length, d_hi + L + pad)
            if t_end <= t_start:
                continue
            out.append(Window(t_start, t_end, strand, int(len(grp))))
    out.sort(key=lambda w: (-w.nseeds, w.t_start, w.strand))
    # merge overlapping same-strand windows (keep the larger seed count)
    merged: List[Window] = []
    for w in out:
        absorbed = False
        for m in merged:
            if m.strand == w.strand and not (
                w.t_end <= m.t_start or w.t_start >= m.t_end
            ):
                m.t_start = min(m.t_start, w.t_start)
                m.t_end = max(m.t_end, w.t_end)
                m.nseeds += w.nseeds
                absorbed = True
                break
        if not absorbed:
            merged.append(w)
    return merged[:max_windows]


class GenomeIndex:
    """Whole-genome seed index: per-chromosome SeedIndexes + sequence cache.

    The in-memory replacement for gfServer+2bit (reference:
    runner.start_blat_server; SURVEY.md §2a). ``candidates`` returns
    windows tagged with chrom; ``fetch_codes`` serves window sequences for
    SW scoring. ``save``/``load`` persist the packed artifact (2-bit
    genome + sorted seed arrays) — the formalized equivalent of the
    reference's cached ``.2bit`` (SURVEY.md §5 checkpoint/resume).
    """

    def __init__(self, chrom_seqs: Dict[str, str], k: int = 11,
                 step: Optional[int] = None):
        self.k = k
        total = sum(len(s) for s in chrom_seqs.values())
        # auto: dense index for panel-scale genomes, gfServer-style
        # non-overlapping tiles for real genomes (memory / k)
        self.step = step if step is not None else (1 if total < 50_000_000 else k)
        self._codes: Dict[str, np.ndarray] = {
            c: encode_seq(s) for c, s in chrom_seqs.items()
        }
        self._index: Dict[str, SeedIndex] = {
            c: SeedIndex(codes, k, step=self.step)
            for c, codes in self._codes.items()
        }

    def save(self, path) -> None:
        from breakmer_tpu.encode import pack_2bit

        arrays = {
            "__k__": np.array([self.k], dtype=np.int64),
            "__step__": np.array([self.step], dtype=np.int64),
        }
        for c, codes in self._codes.items():
            idx = self._index[c]
            arrays[f"{c}::packed"] = pack_2bit(codes)
            arrays[f"{c}::nmask"] = np.packbits(codes >= 4)
            arrays[f"{c}::len"] = np.array([len(codes)], dtype=np.int64)
            arrays[f"{c}::seed_codes"] = idx._codes
            arrays[f"{c}::seed_pos"] = idx._pos
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path) -> "GenomeIndex":
        from breakmer_tpu.encode import unpack_2bit

        data = np.load(path)
        self = cls.__new__(cls)
        self.k = int(data["__k__"][0])
        self.step = int(data["__step__"][0]) if "__step__" in data.files else 1
        self._codes = {}
        self._index = {}
        chroms = sorted(
            {key.split("::")[0] for key in data.files if "::" in key}
        )
        for c in chroms:
            length = int(data[f"{c}::len"][0])
            codes = unpack_2bit(data[f"{c}::packed"], length)
            nmask = np.unpackbits(data[f"{c}::nmask"])[:length].astype(bool)
            codes[nmask] = 4
            self._codes[c] = codes
            idx = SeedIndex.__new__(SeedIndex)
            idx.k = self.k
            idx.step = self.step
            idx.max_hits_per_seed = 64
            idx.length = length
            idx._codes = data[f"{c}::seed_codes"]
            idx._pos = data[f"{c}::seed_pos"]
            self._index[c] = idx
        return self

    @property
    def chroms(self) -> List[str]:
        return list(self._index)

    def fetch_codes(self, chrom: str, start: int, end: int) -> np.ndarray:
        return self._codes[chrom][max(0, start) : end]

    def length(self, chrom: str) -> int:
        return len(self._codes[chrom])

    def candidates(self, query_codes: np.ndarray, **kw) -> List[Window]:
        out: List[Window] = []
        for chrom, idx in self._index.items():
            for w in idx.candidates(query_codes, **kw):
                w.chrom = chrom
                out.append(w)
        out.sort(key=lambda w: (-w.nseeds, w.chrom, w.t_start, w.strand))
        max_windows = kw.get("max_windows", 8)
        return out[:max_windows]
