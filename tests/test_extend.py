"""Contig extension through all region reads (assemble/extend.py, r5).

The pass exists for one measured failure mode (TANDEM_FLOOR_r05 oracle:
32/45 tandem misses were contigs ending inside the array, with the
unique flank carried only by clean-mapped reads) — these tests pin its
three safety properties: faithful consensus growth, per-read phased
voting (no multi-placement vote inflation), and torus cycle detection
inside pure arrays.
"""

import random

import numpy as np

from breakmer_tpu.assemble.extend import (
    ReadAnchorIndex,
    RegionAnchorCounts,
    extend_contig_codes,
    extend_contigs,
)
from breakmer_tpu.assemble.greedy import Contig, ContigRead
from breakmer_tpu.encode import ReadBatch, encode_seq, revcomp_codes


def _rand(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


def _tile(hap: str, step: int = 7, read_len: int = 60, rc_half=True):
    """Reads tiling hap, alternating strand when rc_half."""
    seqs = []
    for i, s in enumerate(range(0, len(hap) - read_len + 1, step)):
        r = hap[s:s + read_len]
        if rc_half and i % 2:
            r = r.translate(str.maketrans("ACGT", "TGCA"))[::-1]
        seqs.append(r)
    return ReadBatch.from_seqs(seqs)


def test_extends_to_read_coverage_both_sides():
    hap = _rand(11, 400)
    reads = _tile(hap)
    index = ReadAnchorIndex(reads, 31)
    core = encode_seq(hap[150:250])
    ext, gl, gr = extend_contig_codes(core, index)
    got = ext
    # grew both directions and every base agrees with the haplotype
    assert gl > 50 and gr > 50
    lo = 150 - gl
    assert lo >= 0
    want = encode_seq(hap[lo:150 + 100 + gr])
    assert np.array_equal(got, want)


def test_strand_flip_reads_extend_identically():
    hap = _rand(12, 300)
    fwd = _tile(hap, rc_half=False)
    mix = _tile(hap, rc_half=True)
    core = encode_seq(hap[120:200])
    a, _, _ = extend_contig_codes(core, ReadAnchorIndex(fwd, 31))
    b, _, _ = extend_contig_codes(core, ReadAnchorIndex(mix, 31))
    assert np.array_equal(a, b)


def test_pure_tandem_array_growth_is_cycle_bounded():
    """Inside a pure array longer than any read, slipped placements all
    verify and naive growth walks the repeat torus to the cap; the
    terminal-anchor cycle detector must stop (and truncate) the walk
    instead of fabricating units."""
    unit = _rand(13, 12)
    hap = _rand(14, 80) + unit * 40 + _rand(15, 80)  # 480 bp pure array
    reads = _tile(hap, step=5)
    index = ReadAnchorIndex(reads, 31)
    # contig starting inside the array
    s = 80 + 5 * 12
    core = encode_seq(hap[s:s + 70])
    ext, gl, gr = extend_contig_codes(core, index, max_grow=1000)
    # growth must stay far below the cap (cycle detected), and the
    # result must still be a substring-consistent walk of the array
    assert len(ext) < 70 + 300


def test_min_votes_blocks_single_read_extension():
    hap = _rand(16, 200)
    # one read only past position 120: its lone vote must not extend
    reads = ReadBatch.from_seqs([hap[60:120], hap[60:120], hap[90:170]])
    index = ReadAnchorIndex(reads, 31)
    core = encode_seq(hap[60:120])
    ext, gl, gr = extend_contig_codes(core, index, min_votes=2)
    assert gr == 0 and gl == 0


def test_offsets_rebased_and_ids_kept():
    hap = _rand(17, 400)
    reads = _tile(hap)
    contig = Contig(
        id="c1", seq=hap[150:250],
        reads=[ContigRead(name="r0", index=0, offset=10, length=60)],
        kmers=[7],
    )
    out = extend_contigs([contig], reads, anchor_k=31)
    assert len(out) == 1
    ext = out[0]
    assert ext.id == "c1" and ext.kmers == [7]
    gl = ext.seq.index(hap[150:250][:40])  # left growth
    assert ext.reads[0].offset == 10 + gl
    assert ext.reads[0].length == 60
    # original contig object untouched (extend_contigs copies)
    assert contig.reads[0].offset == 10


def test_region_unique_flank_stops_growth():
    """Growth stops ~unique_buffer past the point where the terminal
    anchor becomes unique in the region reference."""
    hap = _rand(18, 600)
    reads = _tile(hap, step=4)
    index = ReadAnchorIndex(reads, 31)
    region = RegionAnchorCounts(encode_seq(hap), 31)
    core = encode_seq(hap[200:280])
    ext, gl, gr = extend_contig_codes(core, index, region=region)
    # unique immediately (random sequence): each side caps at the buffer
    assert gr <= 60 + 38 and gl <= 60 + 38  # buffer + one vote round
    want = encode_seq(hap[200 - gl:280 + gr])
    assert np.array_equal(ext, want)


def test_no_reads_or_disabled_is_identity():
    contig = Contig(id="c", seq=_rand(19, 120), reads=[], kmers=[])
    assert extend_contigs([contig], None) == [contig]
    assert extend_contigs([contig], ReadBatch.from_seqs([])) == [contig]
    assert extend_contigs([], _tile(_rand(20, 200))) == []
