"""CSI index (io/csi.py): generalized binning vs the BAI special case,
BGZF round-trip, indexed-vs-linear fetch identity, and non-default
(min_shift, depth) geometries."""

import random

from breakmer_tpu.io import bai
from breakmer_tpu.io.csi import (
    CsiIndex, build_csi, read_csi, reg2bin, reg2bins, write_csi,
)
from breakmer_tpu.io.bam import BamIndexedReader, find_index, read_bam, write_bam
from tests.test_bai import _multi_block_bam, _rec


def test_reg2bin_matches_bai_at_default_geometry():
    rng = random.Random(1)
    for _ in range(500):
        beg = rng.randrange(0, 1 << 28)
        end = beg + rng.randrange(1, 1 << 21)
        assert reg2bin(beg, end) == bai.reg2bin(beg, end)
        assert sorted(reg2bins(beg, end)) == sorted(bai.reg2bins(beg, end))


def test_reg2bin_nondefault_geometry():
    # min_shift=12 (4kb leaves), depth=6: leaf base = (8^6-1)/7 = 37449
    assert reg2bin(0, 1, min_shift=12, depth=6) == 37449
    assert reg2bin(4096, 4097, min_shift=12, depth=6) == 37450
    assert reg2bin(0, 1 << (12 + 18), min_shift=12, depth=6) == 0
    rng = random.Random(2)
    for _ in range(200):
        beg = rng.randrange(0, 1 << 29)
        end = beg + rng.randrange(1, 1 << 22)
        assert reg2bin(beg, end, 12, 6) in reg2bins(beg, end, 12, 6)


def test_csi_write_read_roundtrip(tmp_path):
    idx = build_csi(2, [
        (0, 100, 200, 1 << 16, 2 << 16),
        (0, 16500, 16600, 2 << 16, 3 << 16),
        (1, 50, 150, 3 << 16, (3 << 16) + 77),
    ])
    path = tmp_path / "x.csi"
    write_csi(path, idx)
    back = read_csi(path)
    assert back.n_ref == 2
    assert back.min_shift == 14 and back.depth == 5
    assert back.bins == idx.bins


def test_csi_query_matches_bai_query():
    rng = random.Random(3)
    entries = []
    voff = 1 << 16
    pos = 0
    for i in range(800):
        pos += rng.randrange(0, 4000)
        end = pos + rng.randrange(1, 300)
        entries.append((0, pos, end, voff, voff + 170))
        voff += 170
    bidx = bai.build_bai(1, entries)
    cidx = build_csi(1, entries)
    for _ in range(60):
        beg = rng.randrange(0, pos)
        end = beg + rng.randrange(1, 200_000)
        bchunks = bidx.query(0, beg, end)
        cchunks = cidx.query(0, beg, end)
        # both must cover every record overlapping the window (supersets
        # are legal; compare covered record sets, not raw chunk lists)
        def covered(chunks):
            return {
                (r[1], r[3]) for r in entries
                if r[2] > beg and r[1] < end
                and any(cb <= r[3] < ce for cb, ce in chunks)
            }
        want = {(r[1], r[3]) for r in entries if r[2] > beg and r[1] < end}
        assert covered(bchunks) == want
        assert covered(cchunks) == want


def test_indexed_fetch_via_csi_matches_linear(tmp_path):
    path, refs, recs = _multi_block_bam(tmp_path, n=900)
    # replace the .bai with a .csi: fetches must be identical
    entries_path = str(path) + ".bai"
    import os
    os.remove(entries_path)
    # rebuild the BAM with a CSI sidecar
    write_bam(path, refs, recs, index="csi")
    assert find_index(path) == str(path) + ".csi"
    windows = [("chr1", 0, 50_000), ("chr1", 120_000, 130_000),
               ("chr2", 0, 500_000), ("chr3", 0, 1000)]
    with BamIndexedReader(path) as reader:
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
    got = sorted(r.qname for r in read_bam(path, region=("chr1", 120_000, 130_000)))
    want = sorted(r.qname for r in recs if r.rname == "chr1"
                  and ((120_000 <= r.pos < 130_000) if r.is_unmapped
                       else (r.pos < 130_000 and r.reference_end() > 120_000)))
    assert got == want


def test_csi_handles_beyond_bai_range(tmp_path):
    # positions past 2^29 (BAI's hard limit) index fine with depth=7
    entries = [(0, (1 << 32) + 1000, (1 << 32) + 1100, 1 << 16, 2 << 16)]
    idx = build_csi(1, entries, min_shift=14, depth=7)
    chunks = idx.query(0, 1 << 32, (1 << 32) + 2000)
    assert chunks and chunks[0][0] <= (1 << 16) < chunks[0][1]
    path = tmp_path / "deep.csi"
    write_csi(path, idx)
    back = read_csi(path)
    assert back.depth == 7
    assert back.query(0, 1 << 32, (1 << 32) + 2000) == chunks
    # and an uncovered window stays empty
    assert back.query(0, 0, 1000) == []


def test_csi_no_overprune_sparse_leading_record():
    # review repro: a record in an EMPTY leaf region followed by a later
    # record must not be pruned by an ancestor bin's loffset
    entries = [
        (0, 120_000, 121_000, 100, 200),
        (0, 262_000, 263_000, 300, 400),
    ]
    idx = build_csi(1, entries)
    chunks = idx.query(0, 100_000, 150_000)
    assert any(cb <= 100 < ce for cb, ce in chunks), chunks


def test_write_bam_autoselects_csi_for_long_chromosomes(tmp_path):
    """index=True on an hg-scale chromosome (> 2^29 bp, beyond BAI's
    coordinate ceiling) must come out as a CSI sidecar — and records
    placed past 2^29 must fetch identically to a linear filter."""
    import pytest

    base = (1 << 29) + 250_000  # past BAI's limit
    refs = [("chr1", 600_000_000)]
    recs = [_rec(f"r{i}", p) for i, p in enumerate(
        list(range(1000, 9000, 500))               # early coords
        + list(range(base, base + 8000, 500))      # beyond-BAI coords
    )]
    recs.sort(key=lambda r: r.pos)
    path = tmp_path / "long.bam"
    write_bam(path, refs, recs, index=True)
    assert find_index(path) == str(path) + ".csi"  # auto-picked CSI

    with BamIndexedReader(path) as reader:
        got = sorted(r.qname for r in reader.fetch("chr1", base, base + 3000))
        want = sorted(r.qname for r in recs
                      if base <= r.pos < base + 3000 or
                      (r.pos < base + 3000 and r.reference_end() > base))
        assert got == want and len(got) >= 6

    # an explicit BAI on the same records must refuse loudly, not
    # silently misplace everything past 2^29
    with pytest.raises(ValueError, match="2\\^29"):
        write_bam(tmp_path / "bad.bam", refs, recs, index="bai")
