import numpy as np

from breakmer_tpu.encode import (
    BASE_N, PAD, ReadBatch, decode_seq, encode_seq, pack_2bit, pad_tier,
    revcomp, unpack_2bit,
)


def test_encode_roundtrip():
    seq = "ACGTNacgtn"
    codes = encode_seq(seq)
    assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert decode_seq(codes) == "ACGTNACGTN"


def test_revcomp():
    assert revcomp("ACGT") == "ACGT"
    assert revcomp("AACG") == "CGTT"
    assert revcomp("ANT") == "ANT"


def test_pack_unpack_2bit():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=100).astype(np.int8)
    packed = pack_2bit(codes)
    assert packed.dtype == np.uint32
    assert len(packed) == 7  # ceil(100/16)
    out = unpack_2bit(packed, 100)
    np.testing.assert_array_equal(out, codes)


def test_pack_2bit_n_as_zero():
    codes = encode_seq("ACGNT")
    out = unpack_2bit(pack_2bit(codes), 5)
    assert out.tolist() == [0, 1, 2, 0, 3]


def test_read_batch():
    batch = ReadBatch.from_seqs(["ACGT", "AC"], names=["r1", "r2"])
    assert len(batch) == 2
    assert batch.codes.shape == (2, 4)
    assert batch.codes[1, 2] == PAD
    assert batch.seq(0) == "ACGT"
    assert batch.seq(1) == "AC"
    sub = batch.subset([1])
    assert sub.names == ["r2"]
    assert sub.seq(0) == "AC"


def test_pad_tier():
    assert pad_tier(100, (128, 256)) == 128
    assert pad_tier(128, (128, 256)) == 128
    assert pad_tier(200, (128, 256)) == 256
    assert pad_tier(300, (128, 256)) == 512
