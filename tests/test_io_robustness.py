"""Negative-path robustness of the IO layer: truncated / corrupt /
malformed inputs must fail with a contextful ValueError naming the file
(and line where applicable) — never a bare struct.error / IndexError /
gzip codec exception, and never an infinite loop.

The reference leans on htslib/pysam for these guarantees (SURVEY.md §2
#6 ingest row, [recon]); here the first-party readers carry them."""

import struct

import pytest

from breakmer_tpu.io.bam import (
    BamReader, _bgzf_compress, _bgzf_decompress, stream_bam_records,
    write_bam,
)
from breakmer_tpu.io.bed import read_targets_bed
from breakmer_tpu.io.fasta import FastaIndex, read_fasta
from breakmer_tpu.io.sam import SamRecord, parse_cigar, parse_sam_line, read_sam


def _rec(qname="r1", pos=100, seq="ACGT" * 25):
    return SamRecord(qname, 0, "chr1", pos, 60, parse_cigar("100M"),
                     "*", -1, 0, seq, [30] * len(seq))


def _valid_bam(tmp_path, n=3):
    path = tmp_path / "ok.bam"
    write_bam(path, [("chr1", 10000)], [_rec(f"r{i}", 100 + i) for i in range(n)])
    return path


# ---------------------------------------------------------------- BAM/BGZF

def test_bam_non_gzip_junk(tmp_path):
    p = tmp_path / "junk.bam"
    p.write_bytes(b"this is not a gzip stream at all, not even close.\n" * 4)
    with pytest.raises(ValueError, match="corrupt BGZF|gzip"):
        BamReader(p)


def test_bam_bad_magic(tmp_path):
    p = tmp_path / "notbam.bam"
    p.write_bytes(_bgzf_compress(b"XXXX not a bam payload"))
    with pytest.raises(ValueError, match="bad magic"):
        BamReader(p)


def test_bam_truncated_compressed_stream(tmp_path):
    ok = _valid_bam(tmp_path)
    blob = ok.read_bytes()
    cut = tmp_path / "cut.bam"
    cut.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match=str(cut)):
        list(BamReader(cut))


def test_bam_truncated_uncompressed_record(tmp_path):
    ok = _valid_bam(tmp_path)
    data = _bgzf_decompress(ok)
    cut = tmp_path / "cutrec.bam"
    cut.write_bytes(_bgzf_compress(data[:-20]))  # cut into the last record
    with pytest.raises(ValueError, match="truncated or corrupt BAM record"):
        list(BamReader(cut))
    with pytest.raises(ValueError, match="truncated or corrupt BAM record"):
        list(stream_bam_records(cut))


def test_bam_corrupt_block_size_terminates(tmp_path):
    """A zero/negative record block_size must raise, not spin forever
    (off += 4 + block_size stops advancing)."""
    ok = _valid_bam(tmp_path)
    data = bytearray(_bgzf_decompress(ok))
    off = BamReader(ok)._align_off
    struct.pack_into("<i", data, off, -4)
    bad = tmp_path / "neg.bam"
    bad.write_bytes(_bgzf_compress(bytes(data)))
    with pytest.raises(ValueError, match="truncated or corrupt BAM record"):
        list(BamReader(bad))
    with pytest.raises(ValueError, match="truncated or corrupt BAM record"):
        list(stream_bam_records(bad))


def test_bam_truncated_header(tmp_path):
    ok = _valid_bam(tmp_path)
    data = _bgzf_decompress(ok)
    cut = tmp_path / "cuthdr.bam"
    cut.write_bytes(_bgzf_compress(data[:6]))  # magic survives, l_text cut
    with pytest.raises(ValueError, match="truncated BAM header"):
        BamReader(cut)


# ---------------------------------------------------------------- SAM

def test_sam_malformed_line_has_context(tmp_path):
    p = tmp_path / "bad.sam"
    p.write_text(
        "@HD\tVN:1.6\n"
        "r1\t0\tchr1\t101\t60\t4M\t*\t0\t0\tACGT\tIIII\n"
        "r2\t0\tchr1\n"
    )
    with pytest.raises(ValueError, match=rf"{p}:3: .*3 fields"):
        list(read_sam(p))


def test_parse_sam_line_short():
    with pytest.raises(ValueError, match="need >=11"):
        parse_sam_line("r1\t0\tchr1\t101\n")


# ---------------------------------------------------------------- BED

def test_bed_missing_name_column(tmp_path):
    p = tmp_path / "t.bed"
    p.write_text("chr1\t100\t200\tGENE1\nchr1\t300\t400\n")
    with pytest.raises(ValueError, match=rf"{p}:2: malformed BED"):
        read_targets_bed(p)


def test_bed_non_integer_coords(tmp_path):
    p = tmp_path / "t.bed"
    p.write_text("chr1\tstart\t200\tGENE1\n")
    with pytest.raises(ValueError, match=rf"{p}:1: malformed BED"):
        read_targets_bed(p)


def test_bed_comments_and_headers_skipped(tmp_path):
    p = tmp_path / "t.bed"
    p.write_text(
        "# comment\ntrack name=foo\nbrowser position chr1\n"
        "chr1\t100\t200\tGENE1\n"
    )
    assert list(read_targets_bed(p)) == ["GENE1"]


# ---------------------------------------------------------------- FASTA

def test_fasta_empty_file(tmp_path):
    p = tmp_path / "e.fa"
    p.write_text("")
    assert read_fasta(p) == {}
    assert FastaIndex(p).names == []


def test_fasta_fetch_clamps_out_of_range(tmp_path):
    p = tmp_path / "s.fa"
    p.write_text(">chr1\nACGTACGT\n")
    fx = FastaIndex(p)
    assert fx.fetch("chr1", 4, 100) == "ACGT"
    assert fx.fetch("chr1", -5, 2) == "AC"
    assert fx.fetch("chr1", 50, 60) == ""
