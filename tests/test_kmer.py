import jax.numpy as jnp
import numpy as np

from breakmer_tpu.encode import ReadBatch, encode_seq
from breakmer_tpu.ops.kmer import (
    SENTINEL, kmer_codes, kmer_to_str, member_sorted, sample_only_kmers,
    sort_kmers, str_to_kmer, subtract_sorted, unique_counts_sorted,
)
from tests.oracles import oracle_kmer_counts, oracle_kmers


def _codes_for(seqs, pad_to=None):
    batch = ReadBatch.from_seqs(seqs, pad_to=pad_to)
    return jnp.asarray(batch.codes), jnp.asarray(batch.lengths)


def test_kmer_codes_vs_oracle():
    seqs = ["ACGTACGTAC", "TTTTGGGGCC"]
    k = 4
    codes, lengths = _codes_for(seqs)
    km, valid = map(np.asarray, kmer_codes(codes, lengths, k))
    for r, seq in enumerate(seqs):
        expected = oracle_kmers(seq, k)
        got = [kmer_to_str(int(km[r, i]), k) for i in range(km.shape[1]) if valid[r, i]]
        assert got == expected


def test_kmer_codes_n_and_padding():
    seqs = ["ACGNACGT", "ACGT"]
    k = 3
    codes, lengths = _codes_for(seqs)
    km, valid = map(np.asarray, kmer_codes(codes, lengths, k))
    # row 0: windows with N invalid
    got0 = [kmer_to_str(int(km[0, i]), k) for i in range(km.shape[1]) if valid[0, i]]
    assert got0 == ["ACG", "ACG", "CGT"]
    # row 1 padded to len 8: only 2 valid windows
    got1 = [kmer_to_str(int(km[1, i]), k) for i in range(km.shape[1]) if valid[1, i]]
    assert got1 == ["ACG", "CGT"]
    assert int(km[1, 5]) == int(SENTINEL)


def test_unique_counts_sorted_vs_oracle():
    rng = np.random.default_rng(1)
    seqs = ["".join(rng.choice(list("ACGT"), 30)) for _ in range(10)]
    k = 5
    codes, lengths = _codes_for(seqs)
    km, _ = kmer_codes(codes, lengths, k)
    s = sort_kmers(km)
    values, counts, is_start = map(np.asarray, unique_counts_sorted(s))
    got = {
        kmer_to_str(int(values[i]), k): int(counts[i])
        for i in range(len(values))
        if is_start[i]
    }
    assert got == oracle_kmer_counts(seqs, k)


def test_member_and_subtract():
    table = jnp.sort(jnp.array(
        [str_to_kmer(s) for s in ["ACGT", "TTTT", "GGGG"]], dtype=jnp.uint32))
    queries = jnp.array(
        [str_to_kmer("ACGT"), str_to_kmer("CCCC"), 0xFFFFFFFF], dtype=jnp.uint32)
    hit = member_sorted(queries, table)
    assert hit.tolist() == [True, False, False]

    values = queries
    counts = jnp.array([5, 3, 0], dtype=jnp.int32)
    v2, c2 = subtract_sorted(values, counts, table)
    assert int(v2[0]) == int(SENTINEL) and int(c2[0]) == 0  # removed (in ref)
    assert int(v2[1]) == str_to_kmer("CCCC") and int(c2[1]) == 3
    assert int(v2[2]) == int(SENTINEL)


def test_sample_only_kmers_end_to_end():
    # reference is poly-A-ish; sample reads carry a novel junction kmer
    ref = "ACGTACGTACGTACGTACGTACGT"
    novel = "ACGTACTTGCACGT"  # contains kmers absent from ref
    k = 8
    reads = [novel + "ACGTACGT", "TT" + novel, novel]
    batch = ReadBatch.from_seqs(reads)
    values, counts = sample_only_kmers(
        batch.codes, batch.lengths, encode_seq(ref), k, min_count=2)
    assert len(values) > 0
    ref_set = set(oracle_kmers(ref, k))
    from breakmer_tpu.encode import revcomp
    for v, c in zip(values, counts):
        s = kmer_to_str(int(v), k)
        assert s not in ref_set and revcomp(s) not in ref_set
        assert c >= 2
    # counts sorted desc, ties by code asc
    counts_list = [int(c) for c in counts]
    assert counts_list == sorted(counts_list, reverse=True)


def test_sample_only_respects_normal():
    ref = "ACGTACGTACGTACGTACGTACGT"
    novel = "ACGTACTTGCACGT"
    k = 8
    reads = [novel, novel, novel]
    batch = ReadBatch.from_seqs(reads)
    normal = ReadBatch.from_seqs([novel, novel])
    v_no_norm, _ = sample_only_kmers(
        batch.codes, batch.lengths, encode_seq(ref), k, min_count=2)
    v_norm, _ = sample_only_kmers(
        batch.codes, batch.lengths, encode_seq(ref), k,
        normal_codes=normal.codes, normal_lengths=normal.lengths, min_count=2)
    assert len(v_no_norm) > 0
    assert len(v_norm) == 0


def test_kmer_codes_np_matches_device():
    # host twin used by the assembler must agree exactly with the device op
    import numpy as np
    import jax.numpy as jnp
    from breakmer_tpu.ops import kmer as K

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 5, size=(17, 60)).astype(np.int8)  # includes Ns
    lengths = rng.integers(20, 61, size=17).astype(np.int32)
    for k in (5, 11, 15):
        km_d, v_d = K.kmer_codes(jnp.asarray(codes), jnp.asarray(lengths), k)
        km_h, v_h = K.kmer_codes_np(codes, lengths, k)
        np.testing.assert_array_equal(np.asarray(km_d), km_h)
        np.testing.assert_array_equal(np.asarray(v_d), v_h)
