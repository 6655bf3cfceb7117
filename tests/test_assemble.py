import random

import numpy as np

from breakmer_tpu.assemble import assemble, merge_contigs, overlap
from breakmer_tpu.encode import ReadBatch, encode_seq
from breakmer_tpu.ops.kmer import sample_only_kmers


def _tile_reads(seq, read_len=50, step=7):
    reads = []
    for start in range(0, len(seq) - read_len + 1, step):
        reads.append(seq[start : start + read_len])
    return reads


def _region(seed=3, n=400):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_overlap():
    assert overlap("AAACGT", "CGTTTT", 3) == 3
    assert overlap("AAACGT", "CGTTTT", 4) == 0
    assert overlap("ACGT", "TTTT", 2) == 0
    assert overlap("ACGTACGT", "ACGTACGTAA", 8) == 8


def test_merge_contigs():
    merged = merge_contigs(["AAAACCCC", "CCCCGGGG"], min_len=4)
    assert merged == ["AAAACCCCGGGG"]
    # containment removed
    merged = merge_contigs(["ACGTACGTAC", "GTACG"], min_len=4)
    assert merged == ["ACGTACGTAC"]
    # no overlap -> untouched
    merged = merge_contigs(["AAAA", "GGGG"], min_len=3)
    assert sorted(merged) == ["AAAA", "GGGG"]


def _assemble_scenario(sample_seq, region, k=15, min_count=2, **kw):
    reads = _tile_reads(sample_seq)
    batch = ReadBatch.from_seqs(reads)
    values, counts = sample_only_kmers(
        batch.codes, batch.lengths, encode_seq(region), k, min_count=min_count
    )
    return assemble(values, counts, batch, k, **kw), batch


def test_assemble_insertion_contig():
    region = _region()
    ins = "TTGACCATGGATCCGGTACA"  # 20bp novel insertion
    sample = region[:200] + ins + region[200:]
    contigs, batch = _assemble_scenario(sample, region)
    assert len(contigs) >= 1
    # the top contig must contain the full insertion plus flanks
    top = max(contigs, key=lambda c: c.nreads)
    assert ins in top.seq
    # consensus must be a true substring of the sample sequence (no errors)
    assert top.seq in sample
    # reads recorded with offsets that reproduce the consensus
    for cr in top.reads[:5]:
        read_seq = batch.seq(cr.index)
        placed = top.seq[cr.offset : cr.offset + cr.length]
        # read may overhang the consensus bounds; compare the overlap
        lo = max(0, -cr.offset)
        assert read_seq[lo : lo + len(placed)] == placed or len(placed) == 0


def test_assemble_deletion_contig():
    region = _region(seed=5, n=500)
    # 60bp deletion at position 220
    sample = region[:220] + region[280:]
    contigs, _ = _assemble_scenario(sample, region)
    assert len(contigs) >= 1
    top = max(contigs, key=lambda c: c.nreads)
    junction = region[205:220] + region[280:295]  # 30bp spanning the junction
    assert junction in top.seq
    assert top.seq in sample


def test_assemble_no_sv_no_contigs():
    region = _region(seed=9)
    contigs, _ = _assemble_scenario(region, region)
    assert contigs == []


def test_assemble_determinism():
    region = _region(seed=11)
    ins = "GATTACAGATTACAGATTA"
    sample = region[:150] + ins + region[150:]
    c1, _ = _assemble_scenario(sample, region)
    c2, _ = _assemble_scenario(sample, region)
    assert [c.seq for c in c1] == [c.seq for c in c2]
    assert [[r.index for r in c.reads] for c in c1] == [
        [r.index for r in c.reads] for c in c2
    ]


def test_assemble_min_reads_threshold():
    region = _region(seed=13)
    ins = "TTGACCATGGATCCGGTACA"
    sample = region[:200] + ins + region[200:]
    reads = _tile_reads(sample)
    batch = ReadBatch.from_seqs(reads)
    values, counts = sample_only_kmers(
        batch.codes, batch.lengths, encode_seq(region), 15, min_count=2
    )
    contigs = assemble(values, counts, batch, 15, min_contig_reads=10**6)
    assert contigs == []


def test_assemble_two_separate_events():
    region = _region(seed=17, n=800)
    ins1 = "TTGACCATGGATCCGGTACA"
    ins2 = "CCATTAGGCAGCAGATCGAT"
    # two far-apart insertions; reads only near each junction
    sample = region[:200] + ins1 + region[200:600] + ins2 + region[600:]
    reads = _tile_reads(sample[150:290]) + _tile_reads(sample[560:700])
    batch = ReadBatch.from_seqs(reads)
    values, counts = sample_only_kmers(
        batch.codes, batch.lengths, encode_seq(region), 15, min_count=2
    )
    contigs = assemble(values, counts, batch, 15)
    seqs = "|".join(c.seq for c in contigs)
    assert ins1 in seqs and ins2 in seqs
    assert len(contigs) >= 2


def test_merge_contig_objects_offsets_and_reads():
    """Read-aware OLC merge: absorbed contig's reads shift by the fuse
    offset; containments transfer reads at the found offset."""
    from breakmer_tpu.assemble.greedy import Contig, ContigRead
    from breakmer_tpu.assemble.olc import merge_contig_objects

    a = Contig("a", "ACGTACGTACGTACGTACGTGGGG", [ContigRead("r1", 0, 0, 24)], [])
    #                      ^ suffix ACGTACGTGGGG... overlap with b's prefix
    b = Contig("b", "ACGTACGTGGGGTTTTCCCCAAAA", [ContigRead("r2", 1, 0, 24)], [])
    merged = merge_contig_objects([a, b], min_len=12)
    assert len(merged) == 1
    m = merged[0]
    assert m.id == "a"
    assert m.seq == "ACGTACGTACGTACGTACGTGGGGTTTTCCCCAAAA"
    offs = {r.name: r.offset for r in m.reads}
    assert offs == {"r1": 0, "r2": 12}
    # containment: c inside m.seq at offset 20
    c = Contig("c", "GGGGTTTT", [ContigRead("r3", 2, 0, 8)], [])
    merged2 = merge_contig_objects([m, c], min_len=8)
    assert len(merged2) == 1
    assert {r.name: r.offset for r in merged2[0].reads}["r3"] == 20


def test_merge_contig_objects_no_overlap_unchanged():
    from breakmer_tpu.assemble.greedy import Contig, ContigRead
    from breakmer_tpu.assemble.olc import merge_contig_objects

    a = Contig("a", "ACGTACGTACGTACGTACGTACGT", [ContigRead("r1", 0, 0, 24)], [])
    b = Contig("b", "TTTTCCCCAAAAGGGGTTTTCCCC", [ContigRead("r2", 1, 0, 24)], [])
    assert [c.id for c in merge_contig_objects([a, b], 20)] == ["a", "b"]
