"""Native IO runtime vs pure-Python implementations (skip when the
toolchain/library is unavailable — callers always have fallbacks)."""

import numpy as np
import pytest

from breakmer_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_bgzf_inflate_matches_gzip():
    import gzip

    from breakmer_tpu.io.bam import _bgzf_compress

    payload = b"The quick brown fox " * 5000
    blob = _bgzf_compress(payload)
    assert native.bgzf_inflate(blob) == payload == gzip.decompress(blob)


def test_bam_decode_columns_matches_python(tmp_path):
    from breakmer_tpu.io.bam import BamReader, write_bam
    from breakmer_tpu.io.sam import SamRecord, parse_cigar
    from breakmer_tpu.encode import encode_seq

    refs = [("chr1", 100000), ("chr2", 5000)]
    rng = np.random.default_rng(0)
    records = []
    for i in range(50):
        seq = "".join(rng.choice(list("ACGTN"), 80))
        cig = f"{40 + i % 20}M{40 - i % 20}S" if i % 3 else "80M"
        records.append(
            SamRecord(f"read{i}", int(rng.integers(0, 4096)), "chr1",
                      int(rng.integers(0, 9000)), 60, parse_cigar(cig),
                      "chr2" if i % 5 == 0 else "chr1",
                      int(rng.integers(0, 4000)), int(rng.integers(-500, 500)),
                      seq, [int(x) for x in rng.integers(2, 41, 80)])
        )
    path = tmp_path / "t.bam"
    write_bam(path, refs, records)

    reader = BamReader(path)
    cols = native.bam_decode_columns(reader._data, reader._align_off)
    assert cols is not None and cols["n"] == 50
    py_records = list(reader)
    for i, rec in enumerate(py_records):
        assert cols["pos"][i] == rec.pos
        assert cols["flag"][i] == rec.flag
        assert cols["tlen"][i] == rec.tlen
        assert cols["lseq"][i] == len(rec.seq)
        assert cols["next_pos"][i] == rec.pnext
        left, right = rec.soft_clips()
        assert cols["clip_left"][i] == left
        assert cols["clip_right"][i] == right
        assert cols["ref_span"][i] == rec.reference_end() - rec.pos
        np.testing.assert_array_equal(
            cols["seq_codes"][i, : len(rec.seq)], encode_seq(rec.seq)
        )
        assert list(cols["quals"][i, : len(rec.qual)]) == rec.qual
        name = bytes(cols["names"][i]).split(b"\x00")[0].decode()
        assert name == rec.qname


def test_fastq_decode_matches_python(tmp_path):
    from breakmer_tpu.encode import ReadBatch
    from breakmer_tpu.io.fastq import read_fastq, write_fastq

    rng = np.random.default_rng(1)
    seqs = ["".join(rng.choice(list("ACGTN"), int(rng.integers(30, 90))))
            for _ in range(40)]
    quals = [[int(x) for x in rng.integers(2, 41, len(s))] for s in seqs]
    batch = ReadBatch.from_seqs(seqs, names=[f"q{i}" for i in range(40)], quals=quals)
    path = tmp_path / "t.fq"
    write_fastq(path, batch)

    out = native.fastq_decode(path.read_bytes())
    assert out is not None and out["n"] == 40
    py = read_fastq(path)
    for i in range(40):
        L = int(out["lengths"][i])
        assert L == int(py.lengths[i])
        np.testing.assert_array_equal(out["codes"][i, :L], py.codes[i, :L])
        np.testing.assert_array_equal(out["quals"][i, :L], py.quals[i, :L])
        name = bytes(out["names"][i]).split(b"\x00")[0].decode()
        assert name == py.names[i]


def test_columnar_extraction_matches_record_path(tmp_path):
    """extract_sv_reads_columnar must reproduce extract_sv_reads exactly
    (batch contents, discordant map, coverage) on a mixed BAM."""
    from breakmer_tpu.config import Config
    from breakmer_tpu.extract import extract_sv_reads, extract_sv_reads_columnar
    from breakmer_tpu.io.bam import BamReader, read_bam, write_bam
    from breakmer_tpu.io.sam import SamRecord, parse_cigar

    rng = np.random.default_rng(7)
    refs = [("chr1", 50000), ("chr2", 50000)]

    def rec(i, flag, cigar, pos, rnext="*", pnext=-1, tlen=0):
        L = 100
        seq = "".join(rng.choice(list("ACGT"), L))
        qual = [int(x) for x in rng.integers(2, 41, L)]
        return SamRecord(f"r{i}", flag, "chr1", pos, 60, parse_cigar(cigar),
                         rnext, pnext, tlen, seq, qual)

    records = []
    for i in range(60):
        kind = i % 6
        pos = 1000 + i * 17
        if kind == 0:
            records.append(rec(i, 0, "100M", pos))                    # plain
        elif kind == 1:
            records.append(rec(i, 0, "55M45S", pos))                  # clip
        elif kind == 2:
            records.append(rec(i, 0x1 | 0x20, "100M", pos,
                               rnext="chr2", pnext=3000 + i))         # disc
        elif kind == 3:
            records.append(rec(i, 0x1 | 0x8 | 0x40, "100M", pos))     # mate um
        elif kind == 4:
            records.append(rec(i, 0x4, "", pos))                      # unmapped
        else:
            records.append(rec(i, 0x400, "60M40S", pos))              # dup: skip
    path = tmp_path / "mix.bam"
    write_bam(path, refs, records)

    region = ("chr1", 900, 2500)
    reader = BamReader(path)
    cols = native.bam_decode_columns(reader._data, reader._align_off)
    for cfg in (Config(), Config(clip_coverage=True)):
        ref_out = extract_sv_reads(read_bam(path, region=region), region, cfg)
        col_out = extract_sv_reads_columnar(
            cols, [n for n, _ in reader.refs], region, cfg)

        assert col_out.n_records == ref_out.n_records
        assert col_out.n_sv_reads == ref_out.n_sv_reads
        assert col_out.batch.names == ref_out.batch.names
        for i in range(len(ref_out.batch)):
            assert col_out.batch.seq(i) == ref_out.batch.seq(i)
        assert col_out.disc.pairs == ref_out.disc.pairs
        np.testing.assert_array_equal(col_out.coverage, ref_out.coverage)

    # run-level (global) discordant map: columnar twin must match the
    # record path over the WHOLE file (cfg.global_disc_support)
    from breakmer_tpu.extract import (
        global_discordant_pairs,
        global_discordant_pairs_columnar,
    )

    g_rec = global_discordant_pairs(read_bam(path), Config())
    g_col = global_discordant_pairs_columnar(
        cols, [n for n, _ in reader.refs], Config())
    assert len(g_rec) > 0
    assert g_col.pairs == g_rec.pairs

    # contig-extension read pool: the all-reads columnar twin must match
    # the record path content-exactly (same rows, same codes/lengths)
    from breakmer_tpu.extract import extract_all_reads, extract_all_reads_columnar

    a_rec = extract_all_reads(read_bam(path, region=region), region)
    a_col = extract_all_reads_columnar(
        cols, [n for n, _ in reader.refs], region)
    assert len(a_col) == len(a_rec) > 0
    for i in range(len(a_rec)):
        assert a_col.seq(i) == a_rec.seq(i)


def _sam_text(refs, records) -> bytes:
    """Minimal SAM writer (fixtures.SamBuilder is genome-coupled)."""
    lines = ["@HD\tVN:1.6\tSO:unknown"]
    for name, ln in refs:
        lines.append(f"@SQ\tSN:{name}\tLN:{ln}")
    for r in records:
        cig = "".join(f"{n}{op}" for n, op in r.cigar) if r.cigar else "*"
        qual = "".join(chr(q + 33) for q in r.qual) if r.qual else "*"
        lines.append("\t".join([
            r.qname, str(r.flag), r.rname, str(r.pos + 1), str(r.mapq),
            cig, r.rnext, str(r.pnext + 1), str(r.tlen),
            r.seq if r.seq else "*", qual,
        ]))
    return ("\n".join(lines) + "\n").encode()


def test_sam_decode_columns_matches_python(tmp_path):
    """nat_sam_decode must reproduce io/sam.py parse_sam_line field for
    field, including '=' rnext resolution, '*' qual/seq/rname, and
    mid-read soft clips (clip_right only counts a LAST-op S, matching
    SamRecord.soft_clips)."""
    from breakmer_tpu.encode import encode_seq
    from breakmer_tpu.io.sam import SamRecord, parse_cigar, read_sam

    rng = np.random.default_rng(3)
    refs = [("chr1", 100000), ("chr2", 5000)]
    records = []
    for i in range(60):
        L = int(rng.integers(40, 90))
        seq = "".join(rng.choice(list("ACGTN"), L))
        kind = i % 6
        if kind == 0:
            cig = f"{L}M"
        elif kind == 1:
            cig = f"{L - 20}M20S"
        elif kind == 2:
            cig = f"15S{L - 15}M"
        elif kind == 3:
            cig = f"20M10S{L - 30}M"  # mid-S: clip_right must stay 0
        elif kind == 4:
            cig = f"{L - 30}M10D10I20M" if L >= 50 else f"{L}M"
        else:
            cig = ""
        flag = int(rng.integers(0, 4096)) & ~0x4 if kind != 5 else 0x4
        records.append(SamRecord(
            f"read{i}", flag,
            "chr1" if kind != 5 else "*",
            int(rng.integers(0, 9000)) if kind != 5 else -1,
            60, parse_cigar(cig),
            ("=" if i % 4 == 0 else ("chr2" if i % 5 == 0 else "chr1"))
            if kind != 5 else "*",
            int(rng.integers(0, 4000)), int(rng.integers(-500, 500)),
            seq, [] if i % 7 == 0 else [int(x) for x in rng.integers(2, 41, L)],
        ))
    path = tmp_path / "t.sam"
    path.write_bytes(_sam_text(refs, records))

    out = native.sam_decode_columns(path.read_bytes())
    assert out is not None
    cols, ref_names = out
    assert cols["n"] == 60
    py = list(read_sam(path))
    for i, rec in enumerate(py):
        assert cols["pos"][i] == rec.pos
        assert cols["flag"][i] == rec.flag
        assert cols["mapq"][i] == rec.mapq
        assert cols["tlen"][i] == rec.tlen
        assert cols["lseq"][i] == len(rec.seq)
        assert cols["next_pos"][i] == rec.pnext
        rid = cols["refid"][i]
        assert (ref_names[rid] if rid >= 0 else "*") == rec.rname
        nrid = cols["next_refid"][i]
        assert (ref_names[nrid] if nrid >= 0 else "*") == rec.rnext
        left, right = rec.soft_clips()
        assert cols["clip_left"][i] == left
        assert cols["clip_right"][i] == right
        assert cols["ref_span"][i] == rec.reference_end() - rec.pos
        np.testing.assert_array_equal(
            cols["seq_codes"][i, : len(rec.seq)], encode_seq(rec.seq)
        )
        if rec.qual:
            assert list(cols["quals"][i, : len(rec.qual)]) == rec.qual
        else:
            assert (cols["quals"][i, : len(rec.seq)] == 40).all()
        name = bytes(cols["names"][i]).split(b"\x00")[0].decode()
        assert name == rec.qname


def test_columnar_extraction_from_sam_matches_record_path(tmp_path):
    """The SAM-text native path must feed extract_sv_reads_columnar to the
    same byte-identical results as the record path — the runner now routes
    .sam input through nat_sam_decode."""
    from breakmer_tpu.config import Config
    from breakmer_tpu.extract import (
        extract_sv_reads,
        extract_sv_reads_columnar,
        global_discordant_pairs,
        global_discordant_pairs_columnar,
    )
    from breakmer_tpu.io.sam import SamRecord, parse_cigar, read_sam

    rng = np.random.default_rng(11)
    refs = [("chr1", 50000), ("chr2", 50000)]

    def rec(i, flag, cigar, pos, rnext="*", pnext=-1, tlen=0):
        L = 100
        seq = "".join(rng.choice(list("ACGT"), L))
        qual = [int(x) for x in rng.integers(2, 41, L)]
        return SamRecord(f"r{i}", flag, "chr1", pos, 60, parse_cigar(cigar),
                         rnext, pnext, tlen, seq, qual)

    records = []
    for i in range(60):
        kind = i % 6
        pos = 1000 + i * 17
        if kind == 0:
            records.append(rec(i, 0, "100M", pos))
        elif kind == 1:
            records.append(rec(i, 0, "55M45S", pos))
        elif kind == 2:
            records.append(rec(i, 0x1 | 0x20, "100M", pos,
                               rnext="chr2", pnext=3000 + i))
        elif kind == 3:
            records.append(rec(i, 0x1 | 0x8 | 0x40, "100M", pos))
        elif kind == 4:
            records.append(rec(i, 0x4, "", pos))
        else:
            records.append(rec(i, 0x400, "60M40S", pos))
    path = tmp_path / "mix.sam"
    path.write_bytes(_sam_text(refs, records))

    out = native.sam_decode_columns(path.read_bytes())
    assert out is not None
    cols, ref_names = out
    region = ("chr1", 900, 2500)
    for cfg in (Config(), Config(clip_coverage=True)):
        ref_out = extract_sv_reads(read_sam(path, region=region), region, cfg)
        col_out = extract_sv_reads_columnar(cols, ref_names, region, cfg)
        assert col_out.n_records == ref_out.n_records
        assert col_out.n_sv_reads == ref_out.n_sv_reads
        assert col_out.batch.names == ref_out.batch.names
        for i in range(len(ref_out.batch)):
            assert col_out.batch.seq(i) == ref_out.batch.seq(i)
        assert col_out.disc.pairs == ref_out.disc.pairs
        np.testing.assert_array_equal(col_out.coverage, ref_out.coverage)

    g_rec = global_discordant_pairs(read_sam(path), Config())
    g_col = global_discordant_pairs_columnar(cols, ref_names, Config())
    assert len(g_rec) > 0
    assert g_col.pairs == g_rec.pairs


def test_sam_decode_crlf_matches_python_text_mode():
    """CRLF (and lone-CR) line endings must decode exactly like the
    Python fallback, which reads in universal-newline text mode — a bare
    \\r left in the QUAL field would otherwise corrupt it into a phantom
    -20 score and break the '*' missing-qual sentinel."""
    rec = "r1\t0\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\t*"
    rec2 = "r2\t0\tchr1\t200\t60\t4M\t*\t0\t0\tACGT\tIIII"
    for sep in ("\r\n", "\r"):
        blob = (sep.join(["@SQ\tSN:chr1\tLN:1000", rec, rec2]) + sep).encode()
        out = native.sam_decode_columns(blob)
        assert out is not None
        cols, ref_names = out
        assert cols["n"] == 2 and ref_names == ["chr1"]
        assert (cols["quals"][0, :4] == 40).all()            # '*' sentinel
        assert list(cols["quals"][1, :4]) == [40, 40, 40, 40]  # 'I'-33
        assert cols["lseq"].tolist() == [4, 4]


def test_sam_decode_rejects_malformed_gracefully():
    """Malformed SAM must return None (caller falls back to the Python
    record path), never crash or misparse."""
    cases = [
        b"read1\t0\tchr1\t100\n",                      # too few fields
        b"read1\t0\tchr1\t100\t60\t10Q\t*\t0\t0\tACGT\t!!!!\n",  # bad cigar op
        b"@HD only a header\n@SQ\tSN:chr1\tLN:100\n",  # headers only -> 0 records
        b"",                                            # empty
    ]
    out = native.sam_decode_columns(cases[0])
    assert out is None
    out = native.sam_decode_columns(cases[1])
    assert out is None
    out = native.sam_decode_columns(cases[2])
    assert out is not None and out[0]["n"] == 0
    out = native.sam_decode_columns(cases[3])
    assert out is not None and out[0]["n"] == 0
    # random binary garbage: any outcome but a crash/misparse is fine —
    # either None (malformed) or a decode that round-trips its own counts
    rng = np.random.default_rng(0)
    for _ in range(20):
        blob = bytes(rng.integers(0, 256, int(rng.integers(1, 400)), dtype=np.uint8))
        res = native.sam_decode_columns(blob)
        if res is not None:
            cols, _ = res
            assert cols["n"] >= 0


def test_pack_2bit_matches_numpy():
    from breakmer_tpu.encode import pack_2bit as np_pack

    rng = np.random.default_rng(2)
    codes = rng.integers(0, 5, 1000).astype(np.int8)
    nat = native.pack_2bit(codes)
    np.testing.assert_array_equal(nat, np_pack(codes))


def test_native_sw_traceback_matches_python():
    """nat_sw_traceback must be byte-identical to the numpy oracle path
    (score, coords, ops, match counts) across random and adversarial
    cases including Ns, empty alignments, and gap-heavy pairs."""
    import pytest
    from breakmer_tpu.align.traceback import traceback_align
    from breakmer_tpu.ops.sw import SWParams

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(17)
    cases = []
    for _ in range(30):
        n = int(rng.integers(5, 200))
        m = int(rng.integers(5, 400))
        q = rng.integers(0, 4, n).astype(np.int8)
        t = rng.integers(0, 4, m).astype(np.int8)
        cases.append((q, t))
    # planted: exact hit, gapped hit, N-masked, all-mismatch
    base = rng.integers(0, 4, 120).astype(np.int8)
    tgt = np.concatenate([rng.integers(0, 4, 40).astype(np.int8), base,
                          rng.integers(0, 4, 40).astype(np.int8)])
    cases.append((base, tgt))
    gapq = np.concatenate([base[:60], base[80:]])
    cases.append((gapq, tgt))
    qn = base.copy(); qn[50:60] = 4
    cases.append((qn, tgt))
    cases.append((np.zeros(30, np.int8), np.full(50, 3, np.int8)))
    params_list = [SWParams(), SWParams(match=3, mismatch=2, gap_open=4, gap_extend=2)]
    for q, t in cases:
        for params in params_list:
            a = traceback_align(q, t, params, use_native=False)
            b = traceback_align(q, t, params, use_native=True)
            assert (a.score, a.q_start, a.q_end, a.t_start, a.t_end,
                    a.matches, a.mismatches, a.ops) == \
                   (b.score, b.q_start, b.q_end, b.t_start, b.t_end,
                    b.matches, b.mismatches, b.ops)


def test_sam_decode_ref_table_overflow_retries(monkeypatch):
    """A SAM whose reference-name table exceeds the initial blob buffer
    must transparently retry with a buffer sized from nat_sam_count's
    reported ref_len — not silently fall back to the slow Python parse
    (ADVICE r2: native.py fixed 4 MiB cap)."""
    if native._load() is None:
        pytest.skip("native lib unavailable")
    # many unique rnames so the NUL-joined table is > the shrunken cap
    recs = []
    for i in range(64):
        recs.append(
            f"r{i}\t0\tcontig_{i:04d}_{'x' * 40}\t100\t60\t4M\t*\t0\t0"
            f"\tACGT\tIIII"
        )
    blob = ("\n".join(recs) + "\n").encode()
    monkeypatch.setattr(native, "_SAM_REF_CAP", 64)  # force the -2 path
    out = native.sam_decode_columns(blob)
    assert out is not None
    cols, ref_names = out
    assert cols["n"] == 64
    assert len(ref_names) == 64 and ref_names[0].startswith("contig_0000")
