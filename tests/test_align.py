import random

import numpy as np
import pytest

from breakmer_tpu.align import GenomeIndex, SeedIndex, realign_contig, traceback_align
from breakmer_tpu.align.realign import RegionRef
from breakmer_tpu.encode import encode_seq, revcomp
from breakmer_tpu.ops.sw import SWParams
from tests.fixtures import rand_seq
from tests.oracles import oracle_sw


def _rand(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


# --------------------------------------------------------------------------
# traceback
# --------------------------------------------------------------------------

def test_traceback_scores_match_oracle():
    rng = np.random.default_rng(7)
    for _ in range(10):
        q = "".join(rng.choice(list("ACGT"), int(rng.integers(8, 40))))
        t = "".join(rng.choice(list("ACGT"), int(rng.integers(8, 60))))
        aln = traceback_align(encode_seq(q), encode_seq(t))
        exp, eqe, ete = oracle_sw(q, t)
        assert aln.score == exp
        if exp > 0:
            assert (aln.q_end - 1, aln.t_end - 1) == (eqe, ete)


def test_traceback_exact_match():
    aln = traceback_align(encode_seq("ACGTACGT"), encode_seq("TTACGTACGTTT"))
    assert aln.ops == [("M", 8)]
    assert (aln.q_start, aln.q_end, aln.t_start, aln.t_end) == (0, 8, 2, 10)
    assert aln.matches == 8 and aln.mismatches == 0
    assert aln.identity == 1.0
    assert aln.blocks == [(0, 2, 8)]


def test_traceback_insertion():
    # query has 6bp the target lacks
    flank1, ins, flank2 = "ACGGTACCAGTT", "CACACA", "GCAGATCGGACT"
    q = flank1 + ins + flank2
    t = flank1 + flank2
    aln = traceback_align(encode_seq(q), encode_seq(t))
    assert aln.ops == [("M", 12), ("I", 6), ("M", 12)]
    assert aln.q_gaps == [(12, 12, 6)]
    assert aln.t_gaps == []
    assert aln.cigar_string() == "12M6I12M"


def test_traceback_deletion():
    flank1, dele, flank2 = "ACGGTACCAGTT", "CACACA", "GCAGATCGGACT"
    q = flank1 + flank2
    t = flank1 + dele + flank2
    aln = traceback_align(encode_seq(q), encode_seq(t))
    assert aln.ops == [("M", 12), ("D", 6), ("M", 12)]
    assert aln.t_gaps == [(12, 12, 6)]
    assert aln.q_gaps == []


def test_split_target_gap_junk():
    """Clean-flanked deletions stay whole; a deletion-sized target gap
    bridging into a junk (<min_identity) flank is cut so the junk side
    can be rejected and re-placed by masked requery (r4: a tandem-dup
    junction inside a repeat family read as deletion-into-the-adjacent-
    copy, ACCURACY_REPEATS dup-as-del failures)."""
    from breakmer_tpu.align.traceback import split_target_gap_junk

    rng = random.Random(7)
    params = SWParams()
    flank1 = rand_seq(70, 60)
    flank2 = rand_seq(71, 60)
    dele = rand_seq(72, 30)
    # legit deletion: both flanks exact -> never split
    q = encode_seq(flank1 + flank2)
    t = encode_seq(flank1 + dele + flank2)
    aln = traceback_align(q, t, params)
    assert ("D", 30) in aln.ops
    assert split_target_gap_junk(aln, q, t, params) == [aln]
    # junk flank: mutate flank2 in the TARGET to ~75% identity -> the DP
    # still bridges (flanks pay for it) but the side must be cut off
    bad = list(flank2)
    for i in range(0, len(bad), 4):
        bad[i] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bad[i]]
    q2 = encode_seq(flank1 + flank2)
    t2 = encode_seq(flank1 + dele + "".join(bad))
    aln2 = traceback_align(q2, t2, params)
    if any(op == "D" and ln >= 15 for op, ln in aln2.ops):
        pieces = split_target_gap_junk(aln2, q2, t2, params)
        assert len(pieces) >= 2, aln2.ops
        # the clean side survives with high identity
        best = max(pieces, key=lambda p: p.matches)
        assert best.matches >= 55
        ident = [p.matches / max(p.matches + p.mismatches, 1)
                 for p in pieces]
        assert max(ident) > 0.95 and min(ident) < 0.90
    else:  # local alignment stopped at the clean flank: equally fine
        assert aln2.q_end <= len(flank1) + 2


def test_rederive_fragmented_gaps():
    """Contract of the BLAT-parity gap normalization (r4): a fragmented
    multi-gap representation (inter-gap M island below the 8bp tile
    anchor) re-derives against the whole window with the long-gap scale
    and is adopted only when it explains >= the same matched bases; the
    adopted score is re-expressed under the caller's params. Single-gap
    and well-anchored alignments pass through untouched."""
    from breakmer_tpu.align.traceback import (
        Alignment,
        _score_ops,
        rederive_fragmented_gaps,
    )

    params = SWParams()
    flank1, dele, flank2 = _rand(40, 60), _rand(41, 89), _rand(42, 60)
    q = encode_seq(flank1 + flank2)
    t = encode_seq(flank1 + dele + flank2)
    # clean single-gap: untouched
    aln = traceback_align(q, t, params)
    assert [op for op, _ in aln.ops].count("D") == 1
    assert rederive_fragmented_gaps(aln, q, t, params) is aln
    # hand-built fragmented representation of the same alignment (two
    # gaps bridged by a 5bp island, 10 fewer matches): the re-derivation
    # finds the clean 60M 89D 60M with MORE matches -> adopted
    frag = Alignment(
        score=150, q_start=0, q_end=120, t_start=0, t_end=209,
        ops=[("M", 55), ("D", 40), ("M", 5), ("D", 49), ("M", 60)],
        matches=110, mismatches=10,
    )
    out = rederive_fragmented_gaps(frag, q, t, params)
    assert out.ops == [("M", 60), ("D", 89), ("M", 60)]
    assert out.matches == 120 and out.mismatches == 0
    assert out.score == _score_ops(out, params)
    # fragmented but the retrace cannot do better than claimed: untouched
    frag2 = Alignment(
        score=500, q_start=0, q_end=120, t_start=0, t_end=209,
        ops=[("M", 55), ("D", 40), ("M", 5), ("D", 49), ("M", 60)],
        matches=121, mismatches=0,   # impossible claim > retrace's 120
    )
    assert rederive_fragmented_gaps(frag2, q, t, params) is frag2
    # two gaps with a WELL-ANCHORED island (>= 8bp): untouched
    frag3 = Alignment(
        score=150, q_start=0, q_end=120, t_start=0, t_end=209,
        ops=[("M", 50), ("D", 40), ("M", 10), ("D", 49), ("M", 60)],
        matches=110, mismatches=10,
    )
    assert rederive_fragmented_gaps(frag3, q, t, params) is frag3


def test_traceback_mismatch_counting():
    q = "ACGTACGTACGT"
    t = "ACGTACCTACGT"  # one mismatch in the middle
    aln = traceback_align(encode_seq(q), encode_seq(t))
    assert aln.matches == 11 and aln.mismatches == 1
    assert aln.ops == [("M", 12)]


def test_traceback_empty():
    aln = traceback_align(encode_seq("GGGG"), encode_seq("CCCC"))
    assert aln.score == 0 and aln.ops == []


# --------------------------------------------------------------------------
# seed index
# --------------------------------------------------------------------------

def test_seed_index_exact_hit():
    ref = _rand(1, 500)
    idx = SeedIndex(encode_seq(ref), 11)
    query = ref[100:180]
    wins = idx.candidates(encode_seq(query))
    assert wins, "no candidate windows"
    w = wins[0]
    assert w.strand == "+"
    assert w.t_start <= 100 and w.t_end >= 180


def test_seed_index_revcomp_hit():
    ref = _rand(2, 500)
    idx = SeedIndex(encode_seq(ref), 11)
    query = revcomp(ref[200:280])
    wins = idx.candidates(encode_seq(query))
    assert wins and wins[0].strand == "-"
    assert wins[0].t_start <= 200 and wins[0].t_end >= 280


def test_seed_index_no_hit():
    ref = _rand(3, 300)
    idx = SeedIndex(encode_seq(ref), 11)
    assert idx.candidates(encode_seq(_rand(99, 60))) == []


def test_genome_index_multi_chrom():
    g = {"chr1": _rand(4, 400), "chr2": _rand(5, 400)}
    gi = GenomeIndex(g, 11)
    query = g["chr2"][150:230]
    wins = gi.candidates(encode_seq(query))
    assert wins and wins[0].chrom == "chr2"


# --------------------------------------------------------------------------
# realign driver
# --------------------------------------------------------------------------

def _region_ref(seq, chrom="chr1", start=1000):
    return RegionRef.build(chrom, start, encode_seq(seq))


def test_realign_full_hit():
    ref = _rand(6, 600)
    region = _region_ref(ref)
    contig = ref[200:340]
    segs = realign_contig(encode_seq(contig), region)
    assert len(segs) == 1
    s = segs[0]
    assert (s.q_start, s.q_end) == (0, 140)
    assert (s.t_start, s.t_end) == (1200, 1340)
    assert s.strand == "+" and s.identity == 1.0


def test_realign_indel_contig():
    ref = _rand(7, 600)
    ins = "TTGACCATGGATCCGGTACA"
    contig = ref[200:280] + ins + ref[280:360]
    segs = realign_contig(encode_seq(contig), _region_ref(ref))
    assert len(segs) == 1
    aln = segs[0].alignment
    assert aln.q_gaps and aln.q_gaps[0][2] == len(ins)
    # insertion point maps to genomic 1000+280 (+-2 for homology shift)
    q_pos, t_pos, ln = aln.q_gaps[0]
    assert abs(segs[0].t_start + (t_pos - aln.t_start) - 1280) <= 2


def test_realign_split_deletion():
    """A contig spanning a 300bp deletion. Under the r4 BLAT-parity
    scoring scale (cheap long target gaps) the whole contig aligns as
    ONE segment with a 300D op — the same deletion information the old
    2/3/5/1 scale produced as two split segments; accept either
    representation, require the deletion itself recovered."""
    ref = _rand(8, 900)
    # contig spans a 300bp deletion: [100..250) + [550..700)
    contig = ref[100:250] + ref[550:700]
    segs = realign_contig(encode_seq(contig), _region_ref(ref))
    if len(segs) == 1:
        a = segs[0]
        assert a.q_start == 0 and a.q_end == 300
        gaps = [(tp, ln) for q_, tp, ln in a.alignment.t_gaps]
        assert any(abs(ln - 300) <= 2 for _, ln in gaps), a.alignment.ops
        assert abs(a.t_start - 1100) <= 2 and abs(a.t_end - 1700) <= 2
    else:
        a, b = segs
        assert a.q_start == 0 and abs(a.q_end - 150) <= 12
        assert abs(b.q_start - 150) <= 12 and b.q_end == 300
        assert abs(a.t_end - 1250) <= 12
        assert abs(b.t_start - 1550) <= 12


def test_realign_inversion_segment():
    ref = _rand(9, 900)
    # middle of contig is an inverted reference segment
    contig = ref[100:200] + revcomp(ref[400:500]) + ref[200:300]
    segs = realign_contig(encode_seq(contig), _region_ref(ref))
    strands = [s.strand for s in segs]
    assert "-" in strands and "+" in strands
    inv = [s for s in segs if s.strand == "-"][0]
    assert abs(inv.t_start - 1400) <= 12 and abs(inv.t_end - 1500) <= 12


def test_realign_translocation_via_genome():
    chr1 = _rand(10, 600)
    chr9 = _rand(11, 600)
    region = _region_ref(chr1, chrom="chr1", start=0)
    genome = GenomeIndex({"chr1": chr1, "chr9": chr9}, 11)
    contig = chr1[100:220] + chr9[300:420]
    segs = realign_contig(encode_seq(contig), region, genome=genome)
    assert len(segs) == 2
    chroms = {s.chrom for s in segs}
    assert chroms == {"chr1", "chr9"}
    s9 = [s for s in segs if s.chrom == "chr9"][0]
    assert abs(s9.t_start - 300) <= 12


def test_realign_nothing():
    region = _region_ref(_rand(12, 500))
    segs = realign_contig(encode_seq(_rand(77, 100)), region)
    assert segs == []


def test_realign_contigs_batched_equals_individual():
    """Lockstep batching across contigs (one device launch per round) must
    be byte-identical to per-contig realignment."""
    from breakmer_tpu.align.realign import realign_contigs

    ref1 = _rand(6, 600)
    ref2 = _rand(8, 900)
    r1 = _region_ref(ref1, start=1000)
    r2 = _region_ref(ref2, start=0)
    ins = "TTGACCATGGATCCGGTACA"
    contigs = [
        (encode_seq(ref1[200:340]), r1),                          # full hit
        (encode_seq(ref1[200:280] + ins + ref1[280:360]), r1),    # indel
        (encode_seq(ref2[100:250] + ref2[550:700]), r2),          # split del
        (encode_seq(_rand(77, 100)), r1),                         # nothing
    ]
    batched = realign_contigs(contigs)
    single = [realign_contig(c, r) for c, r in contigs]
    for b_segs, s_segs in zip(batched, single):
        assert len(b_segs) == len(s_segs)
        for b, s in zip(b_segs, s_segs):
            assert (b.q_start, b.q_end, b.chrom, b.t_start, b.t_end,
                    b.strand, b.score) == (
                s.q_start, s.q_end, s.chrom, s.t_start, s.t_end,
                s.strand, s.score)
            assert b.alignment.ops == s.alignment.ops


def test_split_alignment_cuts_anchor_free_junk_bridge():
    """A gap-riddled random 'bridge' between two real arms (the affine
    DP's LCS threading of an inverted middle) must split into two
    pieces, even though no single query gap exceeds max_q_gap — the
    r2 anchor rule (VERDICT r1 #5 fallout, see olc e2e test)."""
    import numpy as np

    from breakmer_tpu.align.traceback import split_alignment, traceback_align
    from breakmer_tpu.ops.sw import SWParams

    rng = np.random.default_rng(12)
    arm1 = rng.integers(0, 4, 90, dtype=np.int8)
    arm2 = rng.integers(0, 4, 90, dtype=np.int8)
    mid_t = rng.integers(0, 4, 140, dtype=np.int8)
    mid_q = rng.integers(0, 4, 140, dtype=np.int8)  # unrelated -> junk
    q = np.concatenate([arm1, mid_q, arm2])
    t = np.concatenate([arm1, mid_t, arm2])
    params = SWParams()
    aln = traceback_align(q, t, params)
    pieces = split_alignment(aln, q, t, params)
    assert len(pieces) == 2, [p.cigar_string() for p in pieces]
    assert pieces[0].q_start == 0 and pieces[0].q_end <= 110
    assert pieces[1].q_start >= 210 and pieces[1].q_end == 320
    for p in pieces:
        assert p.matches / (p.matches + p.mismatches) > 0.95


def test_split_pieces_trimmed_to_max_score_core():
    """A split piece must not keep a net-negative junk tail glued to its
    good block (r2 48-seed sweep failure: the '+' whole-contig alignment
    of an inversion bridged the inverted middle, and the split piece kept
    ~58 junk query bases past the junction — stealing them from the '-'
    inversion segment of the next masked round). After _max_score_trim,
    each piece ends where its running score peaks."""
    import numpy as np

    from breakmer_tpu.align.traceback import split_alignment, traceback_align
    from breakmer_tpu.ops.sw import SWParams
    from breakmer_tpu.encode import revcomp_codes

    rng = np.random.default_rng(105)
    flank_a = rng.integers(0, 4, 96, dtype=np.int8)
    mid = rng.integers(0, 4, 127, dtype=np.int8)
    flank_c = rng.integers(0, 4, 97, dtype=np.int8)
    t = np.concatenate([flank_a, mid, flank_c])
    q = np.concatenate([flank_a, revcomp_codes(mid), flank_c])  # inversion
    params = SWParams()
    aln = traceback_align(q, t, params)
    pieces = split_alignment(aln, q, t, params)
    if len(pieces) == 1:
        # the DP chose a clean 2-segment shape for this seed; the property
        # sweep covers the bridging shape — nothing to assert here
        return
    # no piece may extend meaningfully past its flank into the inverted
    # middle (a few bases of edge wobble from chance matches are fine)
    assert pieces[0].q_end <= 96 + 8, pieces[0].q_end
    assert pieces[-1].q_start >= 96 + 127 - 8, pieces[-1].q_start


def test_inversion_middle_segment_recovered_full_length():
    """End-to-end realign of an inversion contig: the '-' middle segment
    must span the full inverted interval, not the leftover after a junk
    bridge stole part of it (r2 sweep seeds 105/126)."""
    import numpy as np

    from breakmer_tpu.align.realign import RegionRef, realign_contig
    from breakmer_tpu.encode import revcomp_codes
    from breakmer_tpu.ops.sw import SWParams

    rng = np.random.default_rng(105)
    ref = rng.integers(0, 4, 1800, dtype=np.int8)
    mid, size = 900, 127
    contig = np.concatenate([
        ref[mid - 96 : mid], revcomp_codes(ref[mid : mid + size]),
        ref[mid + size : mid + size + 97],
    ])
    rr = RegionRef.build("chr1", 0, ref)
    segs = realign_contig(contig, rr, params=SWParams())
    minus = [s for s in segs if s.strand == "-"]
    assert minus, [(s.q_start, s.q_end, s.strand) for s in segs]
    m = minus[0]
    assert m.t_start <= mid + 4 and m.t_end >= mid + size - 4, (
        m.t_start, m.t_end, mid, mid + size)


def test_split_alignment_keeps_real_deletion_and_divergent_segment():
    import numpy as np

    from breakmer_tpu.align.traceback import split_alignment, traceback_align
    from breakmer_tpu.ops.sw import SWParams

    rng = np.random.default_rng(13)
    t = rng.integers(0, 4, 400, dtype=np.int8)
    # 120bp deletion: query = t minus the middle -> one piece (target gap)
    q = np.concatenate([t[:140], t[260:]])
    params = SWParams()
    aln = traceback_align(q, t, params)
    assert len(split_alignment(aln, q, t, params)) == 1
    # a diverged-but-real segment (SNP every ~12bp, identity ~0.92)
    q2 = t.copy()
    for p in range(6, 400, 12):
        q2[p] = (q2[p] + 1) % 4
    aln2 = traceback_align(q2, t, params)
    assert len(split_alignment(aln2, q2, t, params)) == 1


def test_max_segments_four_segment_chain():
    """A chained rearrangement with 4 contig segments truncates silently
    at the reference-parity default max_segments=3 and resolves fully at
    4 (config-exposed in r2; VERDICT r1 missing #6)."""

    genome = {"chr1": rand_seq(81, 9000), "chr2": rand_seq(82, 6000)}
    gi = GenomeIndex(genome, 11)
    region_ref = RegionRef.build(
        "chr1", 2000, encode_seq(genome["chr1"][2000:3300])
    )
    contig = (genome["chr1"][2150:2250] + genome["chr1"][2600:2700]
              + genome["chr2"][4000:4100] + genome["chr1"][3000:3100])
    segs3 = realign_contig(encode_seq(contig), region_ref, genome=gi,
                           max_segments=3)
    segs4 = realign_contig(encode_seq(contig), region_ref, genome=gi,
                           max_segments=4)
    assert len(segs3) == 3
    assert len(segs4) == 4
    covered = sum(s.q_end - s.q_start for s in segs4)
    assert covered >= 390  # all four 100bp blocks placed
    assert {s.chrom for s in segs4} == {"chr1", "chr2"}
    # config plumbing: the knob reaches realign via realign_opts
    from breakmer_tpu.config import Config
    from breakmer_tpu.io.bed import TargetRegion
    from breakmer_tpu.pipeline import TargetPipeline

    cfg = Config(max_segments=4)
    pipe = TargetPipeline(cfg, TargetRegion("X", "chr1", 2000, 3300, []),
                          region_ref)
    assert pipe.realign_opts()["max_segments"] == 4
