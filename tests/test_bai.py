"""BAI index (io/bai.py) + random-access BAM fetch (io/bam.py):
binning math vs spec, index round-trip, and indexed-vs-linear identity
on a multi-block BAM."""

import random

import pytest

from breakmer_tpu.io.bai import (
    BaiIndex, build_bai, read_bai, reg2bin, reg2bins, write_bai,
)
from breakmer_tpu.io.bam import BamIndexedReader, read_bam, write_bam
from breakmer_tpu.io.sam import SamRecord, parse_cigar


def _rec(qname, pos, rname="chr1", flag=0, cigar=None, seq_len=100,
         rnext="*", pnext=-1):
    seq = "ACGT" * (seq_len // 4)
    cigar = cigar if cigar is not None else f"{len(seq)}M"
    return SamRecord(qname, flag, rname, pos, 60, parse_cigar(cigar),
                     rnext, pnext, 0, seq, [30] * len(seq))


def test_reg2bin_spec_values():
    # level-5 (16kb) bins start at 4681
    assert reg2bin(0, 1) == 4681
    assert reg2bin(16384, 16385) == 4682
    # spans crossing a 16kb boundary move up a level
    assert reg2bin(16000, 17000) == 585
    # whole-chromosome span -> bin 0
    assert reg2bin(0, 1 << 29) == 0


def test_reg2bins_contains_reg2bin():
    rng = random.Random(42)
    for _ in range(200):
        beg = rng.randrange(0, 1 << 28)
        end = beg + rng.randrange(1, 1 << 20)
        assert reg2bin(beg, end) in reg2bins(beg, end)


def test_bai_write_read_roundtrip(tmp_path):
    idx = build_bai(2, [
        (0, 100, 200, 1 << 16, 2 << 16),
        (0, 16500, 16600, 2 << 16, 3 << 16),
        (1, 50, 150, 3 << 16, (3 << 16) + 77),
    ])
    path = tmp_path / "x.bai"
    write_bai(path, idx)
    back = read_bai(path)
    assert back.n_ref == 2
    assert back.bins == idx.bins
    assert back.linear == idx.linear


def _multi_block_bam(tmp_path, n=1500, seed=7):
    """A coordinate-sorted BAM big enough to span several BGZF blocks
    (n * ~170B record > 64KB), with reads spread over 2 chroms."""
    rng = random.Random(seed)
    refs = [("chr1", 2_000_000), ("chr2", 500_000)]
    recs = []
    for i in range(n):
        chrom = "chr1" if i < n * 2 // 3 else "chr2"
        hi = 1_900_000 if chrom == "chr1" else 400_000
        recs.append(_rec(f"r{i}", rng.randrange(0, hi), rname=chrom))
    # a placed-unmapped read (mate mapped) inside a queried window
    recs.append(_rec("unm", 123_456, flag=4, cigar="", rnext="chr1",
                     pnext=123_456))
    recs.sort(key=lambda r: ({"chr1": 0, "chr2": 1}[r.rname], r.pos))
    path = tmp_path / "big.bam"
    write_bam(path, refs, recs, index=True)
    return path, refs, recs


def test_indexed_fetch_matches_linear(tmp_path):
    path, refs, recs = _multi_block_bam(tmp_path)
    assert (tmp_path / "big.bam.bai").exists()
    windows = [("chr1", 0, 50_000), ("chr1", 120_000, 130_000),
               ("chr1", 1_800_000, 2_000_000), ("chr2", 100_000, 110_000),
               ("chr2", 0, 500_000), ("chr3", 0, 1000)]
    with BamIndexedReader(path) as reader:
        assert reader.refs == refs
        for w in windows:
            got = sorted(r.qname for r in reader.fetch(*w))
            chrom, start, end = w
            want = sorted(
                r.qname for r in recs
                if r.rname == chrom and (
                    (start <= r.pos < end) if r.is_unmapped
                    else (r.pos < end and r.reference_end() > start)
                )
            )
            assert got == want, w
    # the unmapped-with-coordinate read is fetchable
    with BamIndexedReader(path) as reader:
        names = [r.qname for r in reader.fetch("chr1", 123_000, 124_000)]
    assert "unm" in names


def test_read_bam_uses_index(tmp_path, monkeypatch):
    path, _refs, recs = _multi_block_bam(tmp_path, n=400)
    # poison the linear reader: if read_bam touches it for a region
    # query while the .bai exists, this test fails
    import breakmer_tpu.io.bam as bam_mod

    class Boom:
        def __init__(self, *a, **k):
            raise AssertionError("linear BamReader used despite .bai")

    monkeypatch.setattr(bam_mod, "BamReader", Boom)
    got = list(read_bam(path, region=("chr1", 0, 100_000)))
    want = [r for r in recs if r.rname == "chr1"
            and r.pos < 100_000 and r.reference_end() > 0]
    assert sorted(r.qname for r in got) == sorted(r.qname for r in want)


def test_write_bam_index_requires_sorted(tmp_path):
    refs = [("chr1", 10_000)]
    recs = [_rec("b", 500), _rec("a", 100)]
    with pytest.raises(ValueError, match="coordinate-sorted"):
        write_bam(tmp_path / "u.bam", refs, recs, index=True)


def test_query_empty_for_uncovered_region():
    idx = build_bai(1, [(0, 100, 200, 1 << 16, 2 << 16)])
    assert idx.query(0, 1_000_000, 1_100_000) == []
    assert idx.query(5, 0, 100) == []
