"""Overlap-layout-consensus helpers.

Reference: olc.py (~150 LoC) — suffix-prefix ``overlap(a, b, min_len)``,
maximal-overlap pair selection, and a greedy shortest-common-superstring
style merge, used for contig consolidation (SURVEY.md §2 #10).
"""

from __future__ import annotations

from typing import List, Optional, Tuple


def overlap(a: str, b: str, min_len: int) -> int:
    """Length of the longest suffix of ``a`` equal to a prefix of ``b``
    with length >= min_len; 0 if none. Exact match (parity rule: the
    reference's overlap is exact string comparison)."""
    start = 0
    while True:
        start = a.find(b[:min_len], start)
        if start == -1:
            return 0
        if b.startswith(a[start:]):
            return len(a) - start
        start += 1


def pick_maximal_overlap(seqs: List[str], min_len: int) -> Tuple[Optional[int], Optional[int], int]:
    """(i, j, olen) of the pair with the largest suffix(i)->prefix(j)
    overlap >= min_len; ties broken by (olen desc, i asc, j asc)."""
    best = (None, None, 0)
    for i, a in enumerate(seqs):
        for j, b in enumerate(seqs):
            if i == j:
                continue
            olen = overlap(a, b, min_len)
            if olen > best[2]:
                best = (i, j, olen)
    return best


def merge_contigs(seqs: List[str], min_len: int = 20) -> List[str]:
    """Greedy merge: repeatedly fuse the maximal-overlap pair until no pair
    overlaps by >= min_len. Also removes exact containments first."""
    seqs = list(seqs)
    # drop sequences contained in another (keep the first occurrence)
    kept: List[str] = []
    for i, s in enumerate(seqs):
        contained = any(
            s in t and (len(s) < len(t) or j < i)
            for j, t in enumerate(seqs)
            if j != i
        )
        if not contained:
            kept.append(s)
    seqs = kept
    while len(seqs) > 1:
        i, j, olen = pick_maximal_overlap(seqs, min_len)
        if i is None or olen < min_len:
            break
        merged = seqs[i] + seqs[j][olen:]
        rest = [s for idx, s in enumerate(seqs) if idx not in (i, j)]
        seqs = [merged] + rest
    return seqs
