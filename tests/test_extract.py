import numpy as np

from breakmer_tpu.config import Config
from breakmer_tpu.encode import ReadBatch
from breakmer_tpu.extract import clean_reads, extract_sv_reads, is_sv_informative
from breakmer_tpu.io.sam import SamRecord, parse_cigar


def _rec(flag=0, cigar="100M", rname="chr1", pos=500, rnext="*", pnext=-1,
         tlen=0, seq=None, qual=None, qname="r"):
    seq = seq or "A" * 100
    qual = qual if qual is not None else [35] * len(seq)
    return SamRecord(qname, flag, rname, pos, 60, parse_cigar(cigar),
                     rnext, pnext, tlen, seq, qual)


def test_classify_softclip():
    cfg = Config()
    keep, reason = is_sv_informative(_rec(cigar="60M40S"), cfg)
    assert (keep, reason) == (True, "softclip")
    keep, reason = is_sv_informative(_rec(cigar="2S98M"), cfg)  # below min
    assert not keep
    # low-quality clip rejected
    qual = [35] * 60 + [1] * 40
    keep, _ = is_sv_informative(_rec(cigar="60M40S", qual=qual), cfg)
    assert not keep


def test_classify_unmapped_and_mate():
    cfg = Config()
    assert is_sv_informative(_rec(flag=0x4), cfg) == (True, "unmapped")
    assert is_sv_informative(_rec(flag=0x1 | 0x8), cfg) == (True, "mate_unmapped")


def test_classify_discordant():
    cfg = Config()
    # mate on another chrom
    keep, reason = is_sv_informative(
        _rec(flag=0x1 | 0x20, rnext="chr9", pnext=100), cfg)
    assert (keep, reason) == (True, "discordant")
    # oversized insert
    keep, reason = is_sv_informative(
        _rec(flag=0x1 | 0x20, rnext="chr1", pnext=90000, tlen=89500), cfg)
    assert (keep, reason) == (True, "discordant")
    # same-orientation pair
    keep, reason = is_sv_informative(
        _rec(flag=0x1 | 0x10 | 0x20, rnext="chr1", pnext=700, tlen=300), cfg)
    assert (keep, reason) == (True, "discordant")
    # proper pair: not informative
    keep, _ = is_sv_informative(
        _rec(flag=0x1 | 0x2 | 0x20, rnext="chr1", pnext=700, tlen=300), cfg)
    assert not keep


def test_classify_skips_secondary_dup():
    cfg = Config()
    assert not is_sv_informative(_rec(flag=0x100, cigar="50M50S"), cfg)[0]
    assert not is_sv_informative(_rec(flag=0x400, cigar="50M50S"), cfg)[0]
    assert not is_sv_informative(_rec(flag=0x800, cigar="50M50S"), cfg)[0]


def test_extract_coverage_and_disc():
    cfg = Config()
    records = [
        _rec(qname="a", cigar="100M", pos=500),
        _rec(qname="b", cigar="60M40S", pos=520),
        _rec(qname="c", flag=0x1 | 0x20, rnext="chr9", pnext=4000, pos=540),
    ]
    res = extract_sv_reads(records, ("chr1", 400, 800), cfg)
    assert res.n_records == 3
    assert res.n_sv_reads == 2  # softclip + discordant
    assert len(res.disc) == 1
    assert res.disc.pairs[0] == ("chr1", 540, "chr9", 4000)
    assert res.coverage_at("chr1", 550) == 3
    assert res.coverage_at("chr1", 401) == 0
    assert res.coverage_at("chr2", 550) == 0  # out of window


def test_clean_reads_quality_trim():
    seqs = ["ACGTACGTACGTACGTACGTACGTACGTACGT"]  # 32bp
    quals = [[30] * 28 + [2, 2, 2, 2]]
    batch = ReadBatch.from_seqs(seqs, quals=quals)
    out = clean_reads(batch, trim_qual=10, min_len=20)
    assert len(out) == 1
    assert int(out.lengths[0]) == 28


def test_clean_reads_min_len():
    batch = ReadBatch.from_seqs(["ACGTACGT"], quals=[[30] * 8])
    assert len(clean_reads(batch, min_len=25)) == 0


def test_clean_reads_adapter_3p():
    adapter = "AGATCGGAAGAGC"
    core = "ACGTACGTACGTACGTACGTACGTACGT"
    # full adapter present
    batch = ReadBatch.from_seqs([core + adapter + "TTTT"],
                                quals=[[35] * (len(core) + len(adapter) + 4)])
    out = clean_reads(batch, adapter_3p=adapter, min_len=10)
    assert out.seq(0) == core
    # partial adapter at read end
    batch = ReadBatch.from_seqs([core + adapter[:5]],
                                quals=[[35] * (len(core) + 5)])
    out = clean_reads(batch, adapter_3p=adapter, min_len=10)
    assert out.seq(0) == core
    # no adapter -> untouched
    batch = ReadBatch.from_seqs([core], quals=[[35] * len(core)])
    out = clean_reads(batch, adapter_3p=adapter, min_len=10)
    assert out.seq(0) == core


def test_clean_reads_adapter_5p():
    adapter = "TTTCCCGGG"
    core = "ACGTACGTACGTACGTACGTACGTACGT"
    batch = ReadBatch.from_seqs([adapter + core],
                                quals=[[35] * (len(adapter) + len(core))])
    out = clean_reads(batch, adapter_5p=adapter, min_len=10)
    assert out.seq(0) == core


def test_clean_reads_adapter_error_tolerant():
    """cutadapt -e analog: adapters with mismatches within floor(e*L)
    still trim; beyond the budget they do not."""
    adapter = "AGATCGGAAGAGCACACGTC"  # 20bp: e=0.1 -> 2 mismatches allowed
    core = "ACGTACGTACGTACGTACGTACGTACGT"
    mut2 = "AGTTCGGAAGAGCACACGAC"  # 2 mismatches
    mut3 = "AGTTCGGATGAGCACACGAC"  # 3 mismatches
    q = lambda s: [[35] * len(s)]
    seq2 = core + mut2 + "TTTT"
    out = clean_reads(ReadBatch.from_seqs([seq2], quals=q(seq2)),
                      adapter_3p=adapter, min_len=10)
    assert out.seq(0) == core
    seq3 = core + mut3 + "TTTT"
    out = clean_reads(ReadBatch.from_seqs([seq3], quals=q(seq3)),
                      adapter_3p=adapter, min_len=10)
    assert out.seq(0) == seq3  # over budget: untouched
    # zero tolerance pins the old exact behavior
    out = clean_reads(ReadBatch.from_seqs([seq2], quals=q(seq2)),
                      adapter_3p=adapter, min_len=10, adapter_error_rate=0.0)
    assert out.seq(0) == seq2


def test_clean_reads_adapter_5p_partial_and_errors():
    adapter = "TTTCCCGGGA"
    core = "ACGTACGTACGTACGTACGTACGTACGT"
    q = lambda s: [[35] * len(s)]
    # adapter suffix overlapping the read's 5' start
    seq = adapter[4:] + core
    out = clean_reads(ReadBatch.from_seqs([seq], quals=q(seq)),
                      adapter_5p=adapter, min_len=10)
    assert out.seq(0) == core
    # one mismatch in a full 10bp 5' adapter (e=0.1 -> 1 allowed)
    mut = "TTTCCAGGGA"
    seq = mut + core
    out = clean_reads(ReadBatch.from_seqs([seq], quals=q(seq)),
                      adapter_5p=adapter, min_len=10)
    assert out.seq(0) == core


def test_clip_coverage_counts_softclip_spans():
    # read clipped on the right at pos 580 (60M40S starting 520): with the
    # flag on, the clipped 40 bases extend depth past the junction
    records = [
        _rec(qname="a", cigar="100M", pos=500),
        _rec(qname="b", cigar="60M40S", pos=520),
    ]
    off = Config()
    on = Config(clip_coverage=True)
    res_off = extract_sv_reads(records, ("chr1", 400, 800), off)
    res_on = extract_sv_reads(records, ("chr1", 400, 800), on)
    # junction at 580: clipped read contributes only with the flag
    assert res_off.coverage_at("chr1", 590) == 1
    assert res_on.coverage_at("chr1", 590) == 2
    # clipped extension is bounded by the read's clip length
    assert res_on.coverage_at("chr1", 621) == 0
    # aligned spans unchanged
    assert res_off.coverage_at("chr1", 550) == res_on.coverage_at("chr1", 550) == 2


def test_adapter_3p_with_indel():
    """cutadapt parity (VERDICT r1 #9): an adapter copy carrying an
    INSERTION or DELETION within floor(e*L) errors is still found and
    trimmed — the r1 Hamming matcher missed these."""
    from breakmer_tpu.extract import _find_adapter_3p

    adapter = "AGATCGGAAGAGCACACGTCTGAACTCC"  # 28bp, e=0.1 -> 2 errors
    payload = "ACGTTGCACCATGGTTACGGATCCGATC"
    # deletion of one adapter base in the read copy
    ad_del = adapter[:10] + adapter[11:]
    assert _find_adapter_3p(payload + ad_del, adapter) == len(payload)
    # insertion of one extra base in the read copy
    ad_ins = adapter[:12] + "T" + adapter[12:]
    assert _find_adapter_3p(payload + ad_ins, adapter) == len(payload)
    # two indels still within floor(0.1*28) = 2
    ad_2 = (adapter[:8] + adapter[9:20] + "G" + adapter[20:])
    assert _find_adapter_3p(payload + ad_2, adapter) == len(payload)
    # three errors exceed the budget -> no trim
    ad_3 = adapter[:5] + adapter[6:12] + "C" + adapter[12:20] + adapter[21:]
    assert _find_adapter_3p(payload + ad_3, adapter) == len(payload + ad_3)


def test_adapter_5p_with_indel():
    from breakmer_tpu.extract import _find_adapter_5p

    adapter = "TTTCCCGGGAAATTTCCCGGGAAACCCC"  # 28bp
    payload = "ACGTTGCACCATGGTTACGGATCCGATG"
    ad_del = adapter[:14] + adapter[15:]
    assert _find_adapter_5p(ad_del + payload, adapter) == len(ad_del)
    ad_ins = adapter[:7] + "A" + adapter[7:]
    assert _find_adapter_5p(ad_ins + payload, adapter) == len(ad_ins)


def test_adapter_overlap_with_indel_at_read_end():
    from breakmer_tpu.extract import _find_adapter_3p

    adapter = "AGATCGGAAGAGCACACGTC"
    payload = "ACGTTGCACCATGGTTACGG"
    # 14bp adapter prefix at the 3' end with one deletion (floor(.1*14)=1)
    ov = adapter[:7] + adapter[8:14]
    read = payload + ov
    assert _find_adapter_3p(read, adapter) == len(payload)


def test_quality_trim_batch_matches_per_read_loop():
    """The vectorized no-adapter clean_reads path must match a straight
    per-read implementation of cutadapt's partial-sum trim exactly."""
    import numpy as np

    from breakmer_tpu.encode import ReadBatch, decode_seq

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(0, 12))
        seqs, quals = [], []
        for _ in range(n):
            L = int(rng.integers(1, 60))
            seqs.append("".join(rng.choice(list("ACGTN"), size=L)))
            quals.append(rng.integers(0, 42, size=L).tolist())
        batch = ReadBatch.from_seqs(seqs, quals=quals)
        trim_qual = int(rng.integers(0, 20))
        min_len = int(rng.integers(1, 30))
        got = clean_reads(batch, trim_qual=trim_qual, min_len=min_len)
        # per-read oracle (the pre-vectorization loop semantics)
        exp = []
        for i in range(n):
            q = np.asarray(quals[i], dtype=np.int32)
            s3 = np.cumsum(trim_qual - q[::-1])
            cut3 = int(np.argmax(s3)) + 1 if s3.size and s3.max() > 0 else 0
            s5 = np.cumsum(trim_qual - q)
            cut5 = int(np.argmax(s5)) + 1 if s5.size and s5.max() > 0 else 0
            lo, hi = cut5, len(q) - cut3
            if hi - lo >= min_len:
                exp.append((batch.names[i], seqs[i][lo:hi], quals[i][lo:hi]))
        assert len(got) == len(exp)
        for j, (name, seq, ql) in enumerate(exp):
            assert got.names[j] == name
            assert got.seq(j) == seq
            assert got.quals[j, : len(ql)].tolist() == ql
