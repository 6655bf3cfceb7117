"""Synthetic-panel fixture builder (SURVEY.md §4.1 golden-parity fixtures).

Constructs a small reference genome, a sample haplotype described as a
list of blocks, reads tiled over the haplotype, and a SAM file whose
alignments are what a simple aligner would emit: full matches inside
blocks, soft clips at junctions — exactly the shapes the extractor keys on
(reference: target.extract_bam_reads classes).

The planted SV is the expected call ("constructed truth"); goldens are not
diffs against a reference binary run, which is unavailable offline
(SURVEY.md provenance caveat). TODO: diff against real BreaKmer output if
the reference mount ever populates.
"""

from __future__ import annotations

import dataclasses
import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

from breakmer_tpu.encode import revcomp


def rand_seq(seed: int, n: int) -> str:
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


@dataclasses.dataclass
class ErrorModel:
    """Illumina-like sequencing-error model (VERDICT r2 missing #1).

    Per-base substitution rate ramping from 0.5x the mean at the 5' end to
    2x at the 3' end (mean ``sub_rate``), occasional 1-2 bp indel errors,
    and quality strings correlated with the errors: baseline quality decays
    linearly ``q_start`` -> ``q_end`` across the read with +-2 jitter;
    substituted bases get a low quality (Q8-Q20) except a ``miscalibrated``
    fraction that keeps the baseline (undetectable miscalls)."""

    sub_rate: float = 0.008
    indel_rate: float = 0.0004
    q_start: int = 38
    q_end: int = 27
    miscalibrated: float = 0.15


_CIG_NUM = "0123456789"


def _expand_cigar(cigar: str) -> List[Tuple[int, str]]:
    out, n = [], 0
    for ch in cigar:
        if ch in _CIG_NUM:
            n = n * 10 + ord(ch) - 48
        else:
            out.append((n, ch))
            n = 0
    return out


def apply_errors(
    seq: str, cigar: str, rng: random.Random, em: ErrorModel
) -> Tuple[str, str, str]:
    """Corrupt one read with the error model; returns (seq, cigar, qual).

    CIGAR surgery keeps the alignment the one a real aligner would emit for
    the corrupted read: substitutions leave it unchanged, an inserted error
    base inside an M run becomes 1I (inside S/I it extends that op), a
    deleted read base inside an M run becomes 1D (leading/trailing D is
    folded into POS by the caller's convention of never deleting the first
    or last aligned base — such errors are skipped instead)."""
    L = len(seq)
    if L == 0 or seq == "*":
        return seq, cigar, "*"
    aligned = cigar not in ("*", "")
    # items: ["b", base_char, op] per read base, interleaved with
    # ["D", count] for reference-only ops; H/P dropped (fixtures never
    # emit them)
    items: List[list] = []
    if aligned:
        i = 0
        for n, op in _expand_cigar(cigar):
            if op in "MIS=X":
                for _ in range(n):
                    items.append(["b", seq[i], op])
                    i += 1
            elif op == "D":
                items.append(["D", n])
    else:
        items = [["b", c, "M"] for c in seq]

    # pass 1: substitutions + per-base quality (ramped rate, 0.5x -> 2x)
    quals: List[int] = []
    base_idx = 0
    out_items: List[list] = []
    n_bases = sum(1 for it in items if it[0] == "b")
    for it in items:
        if it[0] == "D":
            out_items.append(it)
            continue
        frac = base_idx / max(n_bases - 1, 1)
        q = em.q_start + (em.q_end - em.q_start) * frac + rng.randint(-2, 2)
        rate = em.sub_rate * (0.5 + 1.5 * frac)
        if rng.random() < rate:
            it = ["b", rng.choice([b for b in "ACGT" if b != it[1]]), it[2]]
            if rng.random() >= em.miscalibrated:
                q = rng.randint(8, 20)
        out_items.append(it + [int(max(2, min(41, q)))])
        base_idx += 1
    # pass 2: indel errors (1-2 bp), never touching the first/last read base
    items = out_items
    final: List[list] = []
    for pos, it in enumerate(items):
        if it[0] == "D" or pos == 0 or pos == len(items) - 1:
            final.append(it)
            continue
        if rng.random() < em.indel_rate:
            width = rng.randint(1, 2)
            if rng.random() < 0.5:
                # inserted error bases (low qual); op I inside M, else same
                op = "I" if it[2] == "M" else it[2]
                final.append(it)
                for _ in range(width):
                    final.append(["b", rng.choice("ACGT"), op,
                                  rng.randint(8, 20)])
            else:
                # deleted read base: M -> 1D marker, S/I -> just dropped
                if it[2] == "M":
                    final.append(["D", 1])
                # (width>1 deletions collapse to 1 here to keep the
                # never-delete-the-last-base guard simple)
        else:
            final.append(it)

    new_seq = "".join(it[1] for it in final if it[0] == "b")
    qual = "".join(chr(33 + it[3]) for it in final if it[0] == "b")
    if not aligned:
        return new_seq, cigar, qual
    # recompress ops -> cigar (merge adjacent runs; adjacent D's sum)
    runs: List[list] = []
    for it in final:
        op = "D" if it[0] == "D" else it[2]
        n = it[1] if it[0] == "D" else 1
        if runs and runs[-1][1] == op:
            runs[-1][0] += n
        else:
            runs.append([n, op])
    new_cigar = "".join(f"{n}{op}" for n, op in runs)
    return new_seq, new_cigar, qual


@dataclasses.dataclass
class RefBlock:
    chrom: str
    start: int
    end: int
    strand: str = "+"


@dataclasses.dataclass
class NovelBlock:
    seq: str


Block = Union[RefBlock, NovelBlock]


class Haplotype:
    """A sample haplotype = concatenation of blocks over a reference."""

    def __init__(self, genome: Dict[str, str], blocks: Sequence[Block]):
        self.genome = genome
        self.blocks = list(blocks)
        parts = []
        for b in self.blocks:
            if isinstance(b, NovelBlock):
                parts.append(b.seq)
            else:
                seg = genome[b.chrom][b.start : b.end]
                parts.append(seg if b.strand == "+" else revcomp(seg))
        self.seq = "".join(parts)
        # sample-coordinate offsets of each block
        self.offsets = []
        off = 0
        for b, p in zip(self.blocks, parts):
            self.offsets.append(off)
            off += len(p)

    def map_prefix(self, s: int) -> Tuple[Optional[RefBlock], int, int]:
        """For sample position s: (block, pos_in_block, remaining_in_block).
        Returns block=None for novel blocks."""
        for b, off in zip(self.blocks, self.offsets):
            ln = (len(b.seq) if isinstance(b, NovelBlock) else b.end - b.start)
            if off <= s < off + ln:
                if isinstance(b, NovelBlock):
                    return None, s - off, off + ln - s
                return b, s - off, off + ln - s
        return None, 0, 0


def sam_record_for_read(
    hap: Haplotype, s: int, length: int, name: str
) -> Tuple[str, int, int, str, str]:
    """(rname, flag, pos0, cigar, seq) — how a simple aligner would place
    a read starting at sample coordinate ``s``: anchor on the first
    reference block it touches, soft-clip everything outside that block."""
    seq = hap.seq[s : s + length]
    block, in_block, remaining = hap.map_prefix(s)
    if block is None or block.strand == "-":
        # starts in a novel/inverted block: try anchoring on the NEXT
        # forward reference block (left soft clip)
        pos = s
        while pos < s + length:
            b2, ib2, rem2 = hap.map_prefix(pos)
            if b2 is not None and b2.strand == "+":
                clip = pos - s
                matched = min(length - clip, rem2)
                tail = length - clip - matched
                cigar = (f"{clip}S" if clip else "") + f"{matched}M" + (
                    f"{tail}S" if tail else ""
                )
                return b2.chrom, 0, b2.start + ib2, cigar, seq
            pos += rem2 if rem2 else 1
        return "*", 4, -1, "*", seq  # unmapped (fully novel)
    matched = min(length, remaining)
    tail = length - matched
    cigar = f"{matched}M" + (f"{tail}S" if tail else "")
    return block.chrom, 0, block.start + in_block, cigar, seq


class SamBuilder:
    def __init__(
        self,
        genome: Dict[str, str],
        error_model: Optional[ErrorModel] = None,
        error_seed: int = 0,
    ):
        self.genome = genome
        self.lines: List[str] = []
        self._n = 0
        self.error_model = error_model
        self._err_rng = random.Random(error_seed)

    def _add(self, qname, flag, rname, pos0, mapq, cigar, rnext, pnext0, tlen, seq):
        if self.error_model is not None and seq != "*":
            seq, cigar, qual = apply_errors(
                seq, cigar, self._err_rng, self.error_model
            )
        else:
            qual = "I" * len(seq) if seq != "*" else "*"
        self.lines.append(
            "\t".join(
                [
                    qname, str(flag), rname, str(pos0 + 1), str(mapq), cigar,
                    rnext, str(pnext0 + 1), str(tlen), seq, qual,
                ]
            )
        )

    def add_haplotype_reads(
        self, hap: Haplotype, start: int, end: int, read_len: int = 100, step: int = 7,
        prefix: str = "hap",
    ) -> None:
        """Tile single-end reads over hap.seq[start:end]."""
        for s in range(start, min(end, len(hap.seq)) - read_len + 1, step):
            self._n += 1
            rname, flag, pos, cigar, seq = sam_record_for_read(
                hap, s, read_len, f"{prefix}{self._n}"
            )
            self._add(f"{prefix}{self._n}", flag, rname, max(pos, 0), 60, cigar,
                      "*", -1, 0, seq)

    def add_background_pairs(
        self, chrom: str, start: int, end: int, read_len: int = 100, step: int = 25,
        insert: int = 300, prefix: str = "bg",
    ) -> None:
        """Proper pairs straight from the reference (coverage, no SV)."""
        ref = self.genome[chrom]
        for s in range(start, end - insert - read_len, step):
            self._n += 1
            name = f"{prefix}{self._n}"
            r1 = ref[s : s + read_len]
            r2 = revcomp(ref[s + insert : s + insert + read_len])
            self._add(name, 99, chrom, s, 60, f"{read_len}M", "=",
                      s + insert, insert + read_len, r1)
            self._add(name, 147, chrom, s + insert, 60, f"{read_len}M", "=",
                      s, -(insert + read_len), ref[s + insert : s + insert + read_len])

    def add_discordant_pairs(
        self, chrom1: str, pos1: int, chrom2: str, pos2: int, n: int = 4,
        read_len: int = 100, prefix: str = "disc",
    ) -> None:
        """Pairs whose mates straddle two loci (translocation support)."""
        ref1, ref2 = self.genome[chrom1], self.genome[chrom2]
        for i in range(n):
            self._n += 1
            name = f"{prefix}{self._n}"
            s1 = pos1 - read_len - 20 - i * 15
            s2 = pos2 + 20 + i * 15
            self._add(name, 97, chrom1, s1, 60, f"{read_len}M", chrom2, s2, 0,
                      ref1[s1 : s1 + read_len])
            self._add(name, 145, chrom2, s2, 60, f"{read_len}M", chrom1, s1, 0,
                      ref2[s2 : s2 + read_len])

    def write(self, path: str | Path) -> None:
        with open(path, "w") as fh:
            for chrom, seq in self.genome.items():
                fh.write(f"@SQ\tSN:{chrom}\tLN:{len(seq)}\n")
            fh.write("\n".join(self.lines) + "\n")
