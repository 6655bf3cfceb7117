import random

import numpy as np

from breakmer_tpu.align import realign_contig
from breakmer_tpu.align.index import GenomeIndex
from breakmer_tpu.align.realign import RegionRef
from breakmer_tpu.assemble.greedy import Contig, ContigRead
from breakmer_tpu.call import (
    DiscordantPairs, SVEvent, apply_filters, classify_contig, count_split_reads,
)
from breakmer_tpu.call.filters import check_event
from breakmer_tpu.config import Config
from breakmer_tpu.encode import encode_seq, revcomp
from breakmer_tpu.io.bed import TargetInterval, TargetRegion
from breakmer_tpu.utils.rmask import RepeatMask
from breakmer_tpu.utils.complexity import contig_complexity


def _rand(seed, n):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


def _contig_with_reads(seq, n_reads=12, read_len=60, step=10):
    reads = [
        ContigRead(f"r{i}", i, off, read_len)
        for i, off in enumerate(range(0, max(1, len(seq) - read_len + 1), step))
    ]
    return Contig(id="contig1", seq=seq, reads=reads, kmers=[])


def _cfg(**kw):
    base = dict(indel_sr_thresh=2, rearr_sr_thresh=2, trl_sr_thresh=2)
    base.update(kw)
    return Config(**base)


# --------------------------------------------------------------------------
# support counting
# --------------------------------------------------------------------------

def test_count_split_reads():
    contig = Contig(
        "c", "A" * 100,
        [ContigRead("a", 0, 0, 50), ContigRead("b", 1, 40, 50), ContigRead("c", 2, 60, 40)],
        [],
    )
    # junction at 45: read a spans [0,50) -> yes (5 both sides exactly);
    # read b spans [40,90): 45 >= 40+5 -> yes; read c no
    assert count_split_reads(contig, 45, min_overlap=5) == 2
    assert count_split_reads(contig, 5, min_overlap=5) == 1
    assert count_split_reads(contig, 99, min_overlap=5) == 0


def test_discordant_pairs_support():
    d = DiscordantPairs()
    d.add("chr1", 1200, "chr9", 5300)
    d.add("chr1", 1250, "chr9", 5250)
    d.add("chr1", 1250, "chr5", 100)
    assert d.support(("chr1", 1300), ("chr9", 5200), window=500) == 2
    assert d.support(("chr9", 5200), ("chr1", 1300), window=500) == 2  # sym
    assert d.support(("chr1", 1300), ("chr5", 90), window=500) == 1
    assert d.support(("chr2", 0), ("chr3", 0), window=500) == 0


# --------------------------------------------------------------------------
# classification through the realign -> classify path
# --------------------------------------------------------------------------

def test_classify_insertion_indel():
    ref = _rand(21, 600)
    ins = "TTGACCATGGATCCGGTACA"
    contig_seq = ref[200:280] + ins + ref[280:360]
    contig = _contig_with_reads(contig_seq)
    segs = realign_contig(encode_seq(contig_seq), RegionRef.build("chr1", 1000, encode_seq(ref)))
    events = classify_contig(contig, segs, "GENE1", _cfg())
    assert len(events) == 1
    ev = events[0]
    assert (ev.sv_type, ev.sv_subtype) == ("indel", "I")
    assert ev.size == len(ins)
    assert ev.breakpoints[0][0] == "chr1"
    assert abs(ev.breakpoints[0][1] - 1280) <= 2
    assert ev.split_read_count > 0


def test_classify_deletion_indel():
    ref = _rand(22, 600)
    # 40bp deletion: flanks long enough that SW crosses the gap
    contig_seq = ref[160:300] + ref[340:480]
    contig = _contig_with_reads(contig_seq)
    segs = realign_contig(encode_seq(contig_seq), RegionRef.build("chr1", 0, encode_seq(ref)))
    events = classify_contig(contig, segs, "GENE1", _cfg())
    assert len(events) == 1
    ev = events[0]
    assert (ev.sv_type, ev.sv_subtype) == ("indel", "D")
    assert ev.size == 40
    chrom, s, e = ev.breakpoints[0]
    assert abs(s - 300) <= 2 and abs(e - 340) <= 2


def test_classify_large_deletion_split():
    ref = _rand(23, 900)
    # 300bp deletion -> split segments -> rearrangement/del
    contig_seq = ref[100:250] + ref[550:700]
    contig = _contig_with_reads(contig_seq)
    segs = realign_contig(encode_seq(contig_seq), RegionRef.build("chr1", 0, encode_seq(ref)))
    events = classify_contig(contig, segs, "GENE1", _cfg())
    dels = [e for e in events if e.sv_subtype == "del"]
    assert len(dels) == 1
    ev = dels[0]
    assert ev.sv_type == "rearrangement"
    assert abs(ev.size - 300) <= 12
    chrom, s, e = ev.breakpoints[0]
    assert abs(s - 250) <= 12 and abs(e - 550) <= 12


def test_classify_tandem_dup():
    ref = _rand(24, 700)
    # tandem duplication of ref[200:320]
    contig_seq = ref[120:320] + ref[200:400]
    contig = _contig_with_reads(contig_seq)
    segs = realign_contig(encode_seq(contig_seq), RegionRef.build("chr1", 0, encode_seq(ref)))
    events = classify_contig(contig, segs, "GENE1", _cfg())
    dups = [e for e in events if e.sv_subtype == "tandem_dup"]
    assert len(dups) == 1
    ev = dups[0]
    assert abs(ev.size - 120) <= 12
    chrom, s, e = ev.breakpoints[0]
    assert abs(s - 200) <= 12 and abs(e - 320) <= 12


def test_classify_inversion():
    ref = _rand(25, 900)
    contig_seq = ref[100:220] + revcomp(ref[400:520]) + ref[220:340]
    contig = _contig_with_reads(contig_seq)
    segs = realign_contig(encode_seq(contig_seq), RegionRef.build("chr1", 0, encode_seq(ref)))
    events = classify_contig(contig, segs, "GENE1", _cfg())
    invs = [e for e in events if e.sv_subtype == "inversion"]
    assert invs, f"no inversion in {[(e.sv_type, e.sv_subtype) for e in events]}"
    ev = invs[0]
    chrom, s, e = ev.breakpoints[0]
    assert abs(s - 400) <= 12 and abs(e - 520) <= 12


def test_classify_translocation():
    chr1 = _rand(26, 600)
    chr9 = _rand(27, 600)
    contig_seq = chr1[100:220] + chr9[300:420]
    contig = _contig_with_reads(contig_seq)
    genome = GenomeIndex({"chr1": chr1, "chr9": chr9}, 11)
    disc = DiscordantPairs()
    for i in range(4):
        disc.add("chr1", 150 + i * 10, "chr9", 430 + i * 10)
    segs = realign_contig(
        encode_seq(contig_seq), RegionRef.build("chr1", 0, encode_seq(chr1)),
        genome=genome,
    )
    events = classify_contig(contig, segs, "GENE1", _cfg(), disc=disc)
    trls = [e for e in events if e.sv_type == "trl"]
    assert len(trls) == 1
    ev = trls[0]
    assert {bp[0] for bp in ev.breakpoints} == {"chr1", "chr9"}
    assert ev.disc_read_count == 4
    assert ev.split_read_count > 0


# --------------------------------------------------------------------------
# filters
# --------------------------------------------------------------------------

def _dummy_event(**kw):
    base = dict(
        sv_type="indel", sv_subtype="I", genes="G", breakpoints=[("chr1", 100, None)],
        strands="+", align_cigar="50M", total_matching=50, mismatches=0, size=20,
        split_read_count=5, disc_read_count=0, breakpoint_coverages=[10],
        contig_id="c1", contig_seq=_rand(1, 80), segments=[],
    )
    base.update(kw)
    return SVEvent(**base)


def test_filter_split_read_support():
    cfg = _cfg(indel_sr_thresh=5)
    assert check_event(_dummy_event(split_read_count=5), cfg) is None
    reason = check_event(_dummy_event(split_read_count=4), cfg)
    assert reason and reason.startswith("split_read_support")


def test_filter_low_complexity():
    cfg = _cfg()
    ev = _dummy_event(contig_seq="A" * 80)
    reason = check_event(ev, cfg)
    assert reason and reason.startswith("low_complexity")


def test_filter_trl_disc_pairs():
    cfg = _cfg(min_disc_reads=2)
    ev = _dummy_event(sv_type="trl", sv_subtype="+/+", disc_read_count=1,
                      split_read_count=10)
    reason = check_event(ev, cfg)
    assert reason and reason.startswith("disc_read_support")


def test_filter_repeat_mask():
    cfg = _cfg()
    rm = RepeatMask({"chr1": [(0, 1000)]})
    from breakmer_tpu.align.realign import AlignSegment
    from breakmer_tpu.align.traceback import Alignment
    seg = AlignSegment(0, 50, "chr1", 100, 150, "+", 100, 50, 0,
                       Alignment(100, 0, 50, 0, 50, [("M", 50)], 50, 0))
    ev = _dummy_event(segments=[seg])
    reason = check_event(ev, cfg, rmask=rm)
    assert reason and reason.startswith("repeat_overlap")
    # keep_repeat_regions bypasses
    assert check_event(ev, _cfg(keep_repeat_regions=True), rmask=rm) is None


def test_filter_intron_only():
    cfg = _cfg()
    target = TargetRegion(
        "G", "chr1", 0, 1000,
        [TargetInterval("chr1", 0, 500, "G", "exon"),
         TargetInterval("chr1", 500, 1000, "G", "intron")],
    )
    ev_intron = _dummy_event(breakpoints=[("chr1", 700, None)])
    reason = check_event(ev_intron, cfg, target=target)
    assert reason == "intron_only"
    ev_exon = _dummy_event(breakpoints=[("chr1", 100, None)])
    assert check_event(ev_exon, cfg, target=target) is None
    assert check_event(ev_intron, _cfg(keep_intron_vars=True), target=target) is None


def test_apply_filters_annotates():
    cfg = _cfg(indel_sr_thresh=3)
    evs = [_dummy_event(split_read_count=5), _dummy_event(split_read_count=1)]
    passed = apply_filters(evs, cfg)
    assert len(passed) == 1
    assert evs[0].filter_reason is None
    assert evs[1].filter_reason is not None


def test_complexity_measure():
    assert contig_complexity("A" * 100) < 0.05
    assert contig_complexity("ACACACACAC" * 10) < 0.05
    assert contig_complexity(_rand(5, 100)) > 0.5
