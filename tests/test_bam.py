import gzip

import pytest

from breakmer_tpu.io.bam import (
    BGZF_EOF, BamReader, _bgzf_compress, read_alignments, read_bam, write_bam,
)
from breakmer_tpu.io.sam import SamRecord, parse_cigar


def _rec(qname="r1", flag=0, rname="chr1", pos=100, cigar="50M50S",
         rnext="*", pnext=-1, tlen=0, seq=None, qual=None):
    seq = seq if seq is not None else "ACGT" * 25
    qual = qual if qual is not None else [30] * len(seq)
    return SamRecord(qname, flag, rname, pos, 60, parse_cigar(cigar),
                     rnext, pnext, tlen, seq, qual)


def test_bgzf_roundtrip_is_gzip():
    payload = b"hello bgzf " * 1000
    blob = _bgzf_compress(payload)
    assert gzip.decompress(blob) == payload
    assert blob.endswith(BGZF_EOF)


def test_bam_roundtrip(tmp_path):
    refs = [("chr1", 10000), ("chr2", 5000)]
    records = [
        _rec("a", 0, "chr1", 100, "100M", seq="A" * 100),
        _rec("b", 16, "chr1", 300, "40M60S", seq="ACGTN" * 20),
        _rec("c", 99, "chr1", 500, "100M", rnext="chr1", pnext=800,
             tlen=400, seq="G" * 100),
        _rec("d", 97, "chr1", 700, "100M", rnext="chr2", pnext=1000,
             seq="T" * 100),
        _rec("e", 4, "chr1", 900, "", seq="C" * 50),
    ]
    path = tmp_path / "t.bam"
    write_bam(path, refs, records)
    got = list(read_bam(path))
    assert len(got) == len(records)
    for orig, back in zip(records, got):
        assert back.qname == orig.qname
        assert back.flag == orig.flag
        assert back.rname == orig.rname
        assert back.pos == orig.pos
        assert back.cigar == orig.cigar
        assert back.seq == orig.seq
        assert back.qual == orig.qual
        assert back.pnext == orig.pnext
        assert back.tlen == orig.tlen
    # mate chrom resolution
    assert got[3].rnext == "chr2"


def test_bam_region_filter(tmp_path):
    refs = [("chr1", 10000)]
    records = [
        _rec("in1", 0, "chr1", 100, "100M", seq="A" * 100),
        _rec("out1", 0, "chr1", 5000, "100M", seq="C" * 100),
    ]
    path = tmp_path / "t.bam"
    write_bam(path, refs, records)
    got = list(read_bam(path, region=("chr1", 50, 300)))
    assert [r.qname for r in got] == ["in1"]


def test_bam_header_parsing(tmp_path):
    refs = [("chrX", 123), ("chrY", 456)]
    path = tmp_path / "t.bam"
    write_bam(path, refs, [])
    reader = BamReader(path)
    assert reader.refs == [("chrX", 123), ("chrY", 456)]
    assert "SN:chrX" in reader.header_text


def test_bad_magic(tmp_path):
    path = tmp_path / "bad.bam"
    path.write_bytes(_bgzf_compress(b"NOTBAM!!"))
    with pytest.raises(ValueError, match="magic"):
        BamReader(path)


def test_read_alignments_dispatch(tmp_path):
    refs = [("chr1", 10000)]
    path = tmp_path / "t.bam"
    write_bam(path, refs, [_rec("x", 0, "chr1", 10, "100M", seq="A" * 100)])
    assert [r.qname for r in read_alignments(path)] == ["x"]
    sam = tmp_path / "t.sam"
    sam.write_text("@SQ\tSN:chr1\tLN:100\nx2\t0\tchr1\t11\t60\t4M\t*\t0\t0\tACGT\tIIII\n")
    assert [r.qname for r in read_alignments(sam)] == ["x2"]
