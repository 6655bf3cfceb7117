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
    def __init__(self, genome: Dict[str, str]):
        self.genome = genome
        self.lines: List[str] = []
        self._n = 0

    def _add(self, qname, flag, rname, pos0, mapq, cigar, rnext, pnext0, tlen, seq):
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
