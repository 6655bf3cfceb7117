"""Deliberately-simple pure-Python oracles (SURVEY.md §4.2: every kernel is
tested against a straight-line implementation that is obviously correct)."""

from typing import Dict, List, Tuple


def oracle_kmers(seq: str, k: int) -> List[str]:
    """All valid (ACGT-only) k-mers of a sequence, in order."""
    out = []
    for i in range(len(seq) - k + 1):
        window = seq[i : i + k].upper()
        if all(c in "ACGT" for c in window):
            out.append(window)
    return out


def oracle_kmer_counts(seqs: List[str], k: int) -> Dict[str, int]:
    counts: Dict[str, int] = {}
    for s in seqs:
        for km in oracle_kmers(s, k):
            counts[km] = counts.get(km, 0) + 1
    return counts


def oracle_sw(
    q: str,
    t: str,
    match: int = None,
    mismatch: int = None,
    gap_open: int = None,
    gap_extend: int = None,
) -> Tuple[int, int, int]:
    """Triple-loop affine local alignment. Gap of length g costs
    gap_open + gap_extend*g. Returns (best score, q_end, t_end) with
    inclusive 0-based end coordinates (ties: first in (d, i) wavefront
    order, matching ops.sw tie-breaking: earlier diagonal first, then
    smaller i within a diagonal — jnp.argmax picks the first maximum).
    Unspecified params default to the live SWParams() defaults so the
    oracle always tracks the production scoring scale."""
    from breakmer_tpu.ops.sw import SWParams

    _d = SWParams()
    match = _d.match if match is None else match
    mismatch = _d.mismatch if mismatch is None else mismatch
    gap_open = _d.gap_open if gap_open is None else gap_open
    gap_extend = _d.gap_extend if gap_extend is None else gap_extend
    n, m = len(q), len(t)
    NEG = -(10**9)
    H = [[0] * (m + 1) for _ in range(n + 1)]
    E = [[NEG] * (m + 1) for _ in range(n + 1)]
    F = [[NEG] * (m + 1) for _ in range(n + 1)]
    best, bi, bj = 0, -1, -1
    go = gap_open + gap_extend
    ge = gap_extend
    # iterate in wavefront order to match device tie-breaking exactly
    for d in range(n + m - 1):
        for i in range(max(0, d - m + 1), min(d, n - 1) + 1):
            j = d - i
            ii, jj = i + 1, j + 1  # 1-based into DP tables
            E[ii][jj] = max(H[ii][jj - 1] - go, E[ii][jj - 1] - ge)
            F[ii][jj] = max(H[ii - 1][jj] - go, F[ii - 1][jj] - ge)
            s = match if q[i].upper() == t[j].upper() else -mismatch
            if q[i].upper() not in "ACGT" or t[j].upper() not in "ACGT":
                s = NEG
            H[ii][jj] = max(0, H[ii - 1][jj - 1] + s, E[ii][jj], F[ii][jj])
            if H[ii][jj] > best:
                best, bi, bj = H[ii][jj], i, j
    return best, bi, bj
