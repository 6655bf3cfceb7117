"""filter_list (user exclusion), config validation, multi-indel contig."""

import random

import pytest

from breakmer_tpu.align import realign_contig
from breakmer_tpu.align.realign import RegionRef
from breakmer_tpu.call import classify_contig
from breakmer_tpu.call.filters import check_event
from breakmer_tpu.config import Config
from breakmer_tpu.encode import encode_seq
from breakmer_tpu.utils.rmask import RepeatMask
from tests.test_call import _cfg, _contig_with_reads, _dummy_event


def _rand(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_user_filter_suppresses_event():
    cfg = _cfg()
    uf = RepeatMask({"chr1": [(90, 120)]})
    ev = _dummy_event(breakpoints=[("chr1", 100, None)])
    reason = check_event(ev, cfg, user_filter=uf)
    assert reason and reason.startswith("user_filter")
    ev2 = _dummy_event(breakpoints=[("chr1", 500, None)])
    assert check_event(ev2, cfg, user_filter=uf) is None


def _seg(score=200, second=0, t_start=100, t_end=300):
    from breakmer_tpu.align.realign import AlignSegment

    return AlignSegment(
        q_start=0, q_end=t_end - t_start, chrom="chr1", t_start=t_start,
        t_end=t_end, strand="+", score=score, matches=t_end - t_start,
        mismatches=0, alignment=None, second_score=second,
    )


def test_repeat_filter_uniqueness_rescue():
    """A fully-repeat-masked segment passes when its realignment had no
    competing locus (second_score far below score) and is rejected when a
    disjoint locus scored comparably or uniqueness is unknown (-1) or the
    rescue knob is off (r4: junctions inside diverged repeat copies must
    stay callable without giving multi-mapping anchors a pass)."""
    rm = RepeatMask({"chr1": [(0, 1000)]})  # everything masked
    # unambiguous placement: runner-up 40 <= 0.9 * 200 -> rescued
    ev = _dummy_event(segments=[_seg(score=200, second=40)])
    assert check_event(ev, _cfg(), rmask=rm) is None
    # competing locus at 95% of the winner -> still rejected
    ev2 = _dummy_event(segments=[_seg(score=200, second=190)])
    r2 = check_event(ev2, _cfg(), rmask=rm)
    assert r2 and r2.startswith("repeat_overlap")
    # unknown margin (-1, segment not from realign_contigs) -> no rescue
    ev3 = _dummy_event(segments=[_seg(score=200, second=-1)])
    r3 = check_event(ev3, _cfg(), rmask=rm)
    assert r3 and r3.startswith("repeat_overlap")
    # rescue disabled -> old blanket behavior
    ev4 = _dummy_event(segments=[_seg(score=200, second=40)])
    r4 = check_event(ev4, _cfg(repeat_uniq_rescue=False), rmask=rm)
    assert r4 and r4.startswith("repeat_overlap")
    # keep_repeat_regions still bypasses entirely
    ev5 = _dummy_event(segments=[_seg(score=200, second=190)])
    assert check_event(ev5, _cfg(keep_repeat_regions=True), rmask=rm) is None


def test_rescue_ratio_uses_round_winner_score():
    """Pieces cut from one winner traceback inherit the ROUND's
    second_score; the rescue ratio must compare against the round winner
    score, not the smaller piece score (ADVICE r4 #2): a unique small
    piece (second 150 vs round winner 400) is rescued even though
    150 > 0.9 x its own piece score of 100."""
    rm = RepeatMask({"chr1": [(0, 1000)]})
    seg = _seg(score=100, second=150, t_start=100, t_end=200)
    seg.round_score = 400
    ev = _dummy_event(segments=[seg])
    assert check_event(ev, _cfg(), rmask=rm) is None
    # no round_score recorded (-1) -> falls back to the piece score
    seg2 = _seg(score=100, second=150, t_start=100, t_end=200)
    assert seg2.round_score == -1
    r = check_event(_dummy_event(segments=[seg2]), _cfg(), rmask=rm)
    assert r and r.startswith("repeat_overlap")


def test_margin_min_fwd_span():
    """_min_fwd_span: the minimal forward-contig interval a scoring path
    must cover (ADVICE r4 #1 sibling-segment exclusion)."""
    from breakmer_tpu.align.realign import _min_fwd_span

    # '+' strand: score 20 at match=2 -> >=10 bases ending at cell 99
    assert _min_fwd_span(99, 20, "+", 200, 2) == (90, 100)
    # '-' strand: rc cell 99 in a 200-base contig maps to forward 100
    assert _min_fwd_span(99, 20, "-", 200, 2) == (100, 110)
    # zero/negative score -> empty span (never treated as a competitor)
    assert _min_fwd_span(99, 0, "+", 200, 2) == (0, 0)
    # score larger than q_end+1 bases clamps to the available prefix
    assert _min_fwd_span(4, 100, "+", 200, 2) == (0, 5)


def test_sibling_segment_not_margin_competitor():
    """A two-locus contig (translocation shape): the sibling segment's
    locus aligns DIFFERENT query bases, so it must not suppress the
    winner's uniqueness margin (ADVICE r4 #1). Each accepted segment's
    second_score stays far below its score even though the other locus
    scored comparably in the same round's batch."""
    from breakmer_tpu.align.realign import realign_contig

    ref = _rand(91, 1200)
    # contig = [ref 100:300] + [ref 700:900]: two disjoint loci in one
    # region; round 1 scores both windows, each the other's "runner-up"
    contig_seq = ref[100:300] + ref[700:900]
    segs = realign_contig(
        encode_seq(contig_seq), RegionRef.build("chr1", 0, encode_seq(ref))
    )
    assert len(segs) == 2
    for seg in segs:
        assert seg.second_score >= 0  # margins were recorded
        # the sibling locus scored ~= seg.score but competes for
        # DIFFERENT contig bases: excluded from the margin
        assert seg.second_score <= 0.5 * seg.score, (
            seg.second_score, seg.score)


def test_dedup_identical_events():
    """Two sister contigs (het haplotypes of one junction) emit events
    identical in call content: the dedup keeps the first with max
    support and tags the duplicate 'duplicate_call' (r4; knob
    dedup_identical_events)."""
    from breakmer_tpu.pipeline import _dedup_identical

    a = _dummy_event(split_read_count=5, disc_read_count=1, contig_id="c1")
    b = _dummy_event(split_read_count=9, disc_read_count=0, contig_id="c2")
    c = _dummy_event(size=33, contig_id="c3")  # different call: kept
    out = _dedup_identical([a, b, c])
    assert out == [a, c]
    assert a.split_read_count == 9 and a.disc_read_count == 1
    assert b.filter_reason == "duplicate_call"
    assert c.filter_reason is None


def test_dedup_insertion_content_distinguishes():
    """Two same-size insertions at one breakpoint with DIFFERENT inserted
    sequence (tri-allelic het) are distinct calls, not duplicates; a
    sister contig assembled reverse-complement (insert slice is the RC)
    still dedups (ADVICE r4 #4)."""
    from breakmer_tpu.pipeline import _dedup_identical

    ins_a, ins_b = "ACGTACGTACGTACGTACGT", "TTTTGGGGCCCCAAAATTGG"
    flank_l, flank_r = _rand(5, 30), _rand(6, 30)

    def ev(ins, rc=False, cid="c"):
        seq = flank_l + ins + flank_r
        if rc:
            seq = seq.translate(str.maketrans("ACGT", "TGCA"))[::-1]
            jq = [len(flank_r), len(flank_r) + len(ins)]
        else:
            jq = [len(flank_l), len(flank_l) + len(ins)]
        return _dummy_event(size=len(ins), contig_seq=seq, junction_q=jq,
                            contig_id=cid)

    a, b = ev(ins_a, cid="c1"), ev(ins_b, cid="c2")
    out = _dedup_identical([a, b])
    assert out == [a, b]  # different content -> both kept
    c, d = ev(ins_a, cid="c3"), ev(ins_a, rc=True, cid="c4")
    out2 = _dedup_identical([c, d])
    assert out2 == [c]  # same insert up to RC -> deduped
    assert d.filter_reason == "duplicate_call"


def test_config_validate_missing():
    cfg = Config()
    with pytest.raises(ValueError, match="targets_bed_file"):
        cfg.validate()


def test_config_validate_bad_path(tmp_path):
    (tmp_path / "t.bed").write_text("chr1\t0\t10\tG\n")
    (tmp_path / "g.fa").write_text(">chr1\nACGT\n")
    cfg = Config(
        targets_bed_file=str(tmp_path / "t.bed"),
        reference_fasta=str(tmp_path / "g.fa"),
        sample_bam_file=str(tmp_path / "nope.sam"),
    )
    with pytest.raises(FileNotFoundError, match="sample_bam_file"):
        cfg.validate()


def test_config_validate_kmer_sizes(tmp_path):
    (tmp_path / "t.bed").write_text("chr1\t0\t10\tG\n")
    (tmp_path / "g.fa").write_text(">chr1\nACGT\n")
    (tmp_path / "s.sam").write_text("")
    cfg = Config(
        targets_bed_file=str(tmp_path / "t.bed"),
        reference_fasta=str(tmp_path / "g.fa"),
        sample_bam_file=str(tmp_path / "s.sam"),
        kmer_size=9, seed_kmer_size=11,
    )
    with pytest.raises(ValueError, match="kmer_size"):
        cfg.validate()


def test_config_cutadapt_config_file(tmp_path):
    """Reference-style nested cutadapt args file fills the trim knobs;
    explicit main-config keys win (SURVEY.md §2 #2 cutadapt_config_file)."""
    ca = tmp_path / "cutadapt.cfg"
    ca.write_text("# panel adapters\n-a AGATCGGAAGAGC -q 20\n"
                  "--minimum-length 30\n-e 0.12\n")
    cfg = Config.from_dict({
        "cutadapt_config_file": str(ca),
        "trim_qual": 5,  # explicit key overrides the nested file
    })
    assert cfg.adapter_3p == "AGATCGGAAGAGC"
    assert cfg.trim_qual == 5
    assert cfg.min_read_len == 30
    assert cfg.adapter_error_rate == 0.12


def test_two_indels_one_contig():
    """Two well-separated gaps in one alignment -> two indel events."""
    ref = _rand(71, 900)
    ins1 = "TTGACCATGGATCCGGTACA"
    contig_seq = (
        ref[200:300] + ins1 + ref[300:420] + ref[460:560]  # ins + 40bp del
    )
    contig = _contig_with_reads(contig_seq)
    segs = realign_contig(encode_seq(contig_seq), RegionRef.build("chr1", 0, encode_seq(ref)))
    assert len(segs) == 1
    events = classify_contig(contig, segs, "G", _cfg())
    kinds = sorted((e.sv_type, e.sv_subtype) for e in events)
    assert kinds == [("indel", "D"), ("indel", "I")]
    by_kind = {e.sv_subtype: e for e in events}
    assert by_kind["I"].size == len(ins1)
    assert by_kind["D"].size == 40
    assert abs(by_kind["D"].breakpoints[0][1] - 420) <= 2


def test_cutadapt_two_value_quality_and_eq_values(tmp_path):
    """ADVICE r1: '-q 5,20' keeps the 3' cutoff; '=' inside an adapter
    value (linked/parameterized syntax) passes through; '--flag=value'
    still splits."""
    ca = tmp_path / "cutadapt.cfg"
    ca.write_text("-a ADAPTER;e=0.1 -q 5,20\n--minimum-length=30\n")
    cfg = Config.from_dict({"cutadapt_config_file": str(ca)})
    assert cfg.adapter_3p == "ADAPTER;e=0.1"
    assert cfg.trim_qual == 20
    assert cfg.min_read_len == 30


def test_cutadapt_repeated_adapter_rejected(tmp_path):
    ca = tmp_path / "cutadapt.cfg"
    ca.write_text("-a AAAA -a CCCC\n")
    with pytest.raises(ValueError, match="repeated adapter"):
        Config.from_dict({"cutadapt_config_file": str(ca)})


def test_cutadapt_bad_value_names_flag(tmp_path):
    ca = tmp_path / "cutadapt.cfg"
    ca.write_text("-m notanint\n")
    with pytest.raises(ValueError, match="-m"):
        Config.from_dict({"cutadapt_config_file": str(ca)})


def test_cutadapt_missing_file_friendly_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="cutadapt_config_file"):
        Config.from_dict({"cutadapt_config_file": str(tmp_path / "nope.cfg")})
