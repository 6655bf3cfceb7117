"""VCF emission (breakmer_tpu/vcf.py): event mapping incl. the four BND
strand cases, writer round-trip, and REF-base lookup."""

from pathlib import Path

import pytest

from breakmer_tpu.call.events import SVEvent
from breakmer_tpu.vcf import event_vcf_records, read_vcf, write_vcf


def _ev(sv_type, sv_subtype, breakpoints, strands="+", size=0, **kw):
    defaults = dict(
        genes="GENE1",
        align_cigar="100M",
        total_matching=100,
        mismatches=0,
        split_read_count=7,
        disc_read_count=3,
        breakpoint_coverages=[10],
        contig_id="GENE1_contig1",
        contig_seq="ACGT",
    )
    defaults.update(kw)
    return SVEvent(
        sv_type=sv_type, sv_subtype=sv_subtype, breakpoints=breakpoints,
        strands=strands, size=size, **defaults,
    )


def _base_at(chrom, pos):
    return "ACGT"[pos % 4]


def test_insertion_record():
    ev = _ev("indel", "I", [("chr1", 1300, None)], size=21)
    (r,) = event_vcf_records(ev, "x_1", _base_at)
    assert r["alt"] == "<INS>"
    assert r["pos"] == 1300
    assert r["info"]["SVTYPE"] == "INS"
    assert r["info"]["SVLEN"] == 21
    assert r["ref"] == _base_at("chr1", 1300)


def test_deletion_record():
    ev = _ev("indel", "D", [("chr1", 3400, 3460)], size=60)
    (r,) = event_vcf_records(ev, "x_1", _base_at)
    assert r["alt"] == "<DEL>"
    assert (r["pos"], r["info"]["END"], r["info"]["SVLEN"]) == (3400, 3460, -60)


def test_tandem_dup_and_inversion_records():
    dup = _ev("rearrangement", "tandem_dup", [("chr1", 5200, 5400)], size=200)
    (r,) = event_vcf_records(dup, "x", _base_at)
    assert r["alt"] == "<DUP:TANDEM>" and r["info"]["END"] == 5400

    # 2-segment inversion form: two point breakpoints
    inv = _ev(
        "rearrangement", "inversion",
        [("chr1", 11000, None), ("chr1", 10850, None)],
        strands="+/-", size=150,
    )
    (r,) = event_vcf_records(inv, "x", _base_at)
    assert r["alt"] == "<INV>"
    assert (r["pos"], r["info"]["END"]) == (10850, 11000)


@pytest.mark.parametrize(
    "strands,alt1,alt2",
    [
        ("+/+", "{t1}[chr2:4000[", "]chr1:9300]{t2}"),
        ("+/-", "{t1}]chr2:4000]", "{t2}]chr1:9300]"),
        ("-/+", "[chr2:4000[{t1}", "[chr1:9300[{t2}"),
        ("-/-", "]chr2:4000]{t1}", "{t2}[chr1:9300["),
    ],
)
def test_bnd_orientations(strands, alt1, alt2):
    ev = _ev(
        "trl", strands,
        [("chr1", 9300, None), ("chr2", 4000, None)],
        strands=strands,
        breakpoint_coverages=[5, 5],
    )
    r1, r2 = event_vcf_records(ev, "x_5", _base_at)
    t1, t2 = _base_at("chr1", 9300), _base_at("chr2", 4000)
    assert r1["alt"] == alt1.format(t1=t1, t2=t2)
    assert r2["alt"] == alt2.format(t1=t1, t2=t2)
    assert r1["info"]["MATEID"] == "x_5_2"
    assert r2["info"]["MATEID"] == "x_5_1"
    assert r1["info"]["SVTYPE"] == r2["info"]["SVTYPE"] == "BND"


def test_write_read_roundtrip(tmp_path):
    evs = [
        _ev("indel", "I", [("chr1", 1300, None)], size=21),
        _ev("trl", "+/+", [("chr2", 100, None), ("chr1", 50, None)],
            strands="+/+", breakpoint_coverages=[1, 1]),
    ]
    recs = []
    for i, ev in enumerate(evs):
        recs.extend(event_vcf_records(ev, f"a_{i}", _base_at))
    path = tmp_path / "out.vcf"
    write_vcf(path, recs, contigs=[("chr1", 12000), ("chr2", 8000)],
              sample="a", reference="genome.fa")
    text = path.read_text()
    assert text.startswith("##fileformat=VCFv4.2")
    assert "##contig=<ID=chr1,length=12000>" in text
    rows = read_vcf(path)
    # sorted by contig order (chr1 first), then pos
    assert [(r["chrom"], r["pos"]) for r in rows] == [
        ("chr1", 50), ("chr1", 1300), ("chr2", 100)
    ]
    ins = [r for r in rows if r["alt"] == "<INS>"][0]
    assert ins["fmt"] == {"GT": "./.", "SR": "7", "PE": "3"}
    assert ins["info"]["GENES"] == "GENE1"


def test_ref_base_fallback_without_fasta():
    ev = _ev("indel", "D", [("chr1", 10, 20)], size=10)
    (r,) = event_vcf_records(ev, "x", None)
    assert r["ref"] == "N"


def test_insseq_forward_strand():
    """INS records carry the inserted bases recovered from the contig via
    the forward-contig junction span (INSSEQ)."""
    contig = "AAAA" + "TTGACCATGG" + "CCCC"
    ev = _ev("indel", "I", [("chr1", 1300, None)], size=10,
             contig_seq=contig, junction_q=[4, 14])
    (r,) = event_vcf_records(ev, "x", _base_at)
    assert r["info"]["INSSEQ"] == "TTGACCATGG"


def test_insseq_minus_strand_revcomps():
    contig = "AAAA" + "TTGACCATGG" + "CCCC"
    ev = _ev("indel", "I", [("chr1", 1300, None)], strands="-", size=10,
             contig_seq=contig, junction_q=[4, 14])
    (r,) = event_vcf_records(ev, "x", _base_at)
    assert r["info"]["INSSEQ"] == "CCATGGTCAA"  # revcomp of the slice


def test_insseq_omitted_when_ambiguous_or_inconsistent():
    # mixed-strand junction: reference orientation of the insert ambiguous
    ev = _ev("rearrangement", "ins", [("chr1", 1300, None)], strands="+/-",
             size=4, contig_seq="AAAATTTTCCCC", junction_q=[4, 8])
    (r,) = event_vcf_records(ev, "x", _base_at)
    assert "INSSEQ" not in r["info"]
    # junction span inconsistent with the event size
    ev = _ev("indel", "I", [("chr1", 1300, None)], size=10,
             contig_seq="AAAATTTTCCCC", junction_q=[4, 8])
    (r,) = event_vcf_records(ev, "x", _base_at)
    assert "INSSEQ" not in r["info"]
    # no junction info at all (default empty junction_q)
    ev = _ev("rearrangement", "ins", [("chr1", 1300, None)], size=4)
    (r,) = event_vcf_records(ev, "x", _base_at)
    assert "INSSEQ" not in r["info"]
