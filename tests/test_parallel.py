"""Multi-device sharding tests on the 8-virtual-CPU mesh (SURVEY.md §4.4)."""

import jax
import numpy as np
import pytest

from breakmer_tpu.encode import ReadBatch, encode_seq
from breakmer_tpu.ops.kmer import kmer_to_str, revcomp_kmers, str_to_kmer
from breakmer_tpu.parallel import make_mesh_2d, make_region_step, pack_region_batches
from breakmer_tpu.parallel.mesh import _factor_2d
from tests.fixtures import rand_seq


def test_factor_2d():
    assert _factor_2d(8) == (4, 2)
    assert _factor_2d(4) == (2, 2)
    assert _factor_2d(1) == (1, 1)
    assert _factor_2d(6) == (3, 2)
    assert _factor_2d(7) == (7, 1)


def test_mesh_uses_all_devices():
    mesh = make_mesh_2d()
    assert mesh.devices.size == 8  # conftest forces 8 virtual cpu devices
    assert mesh.axis_names == ("regions", "pairs")


def test_revcomp_kmers_device():
    import jax.numpy as jnp

    codes = jnp.array(
        [str_to_kmer("ACGT"), str_to_kmer("AAAA"), 0xFFFFFFFF], dtype=jnp.uint32
    )
    rc = revcomp_kmers(codes, 4)
    assert kmer_to_str(int(rc[0]), 4) == "ACGT"
    assert kmer_to_str(int(rc[1]), 4) == "TTTT"
    assert int(rc[2]) == 0xFFFFFFFF


def _tiny_inputs(G=8, R=16, L=32, Lref=64, B=8, Lq=16, Lt=32, seed=0):
    rng = np.random.default_rng(seed)
    reads = rng.integers(0, 4, size=(G, R, L)).astype(np.int8)
    lengths = np.full((G, R), L, dtype=np.int32)
    refs = rng.integers(0, 4, size=(G, Lref)).astype(np.int8)
    ref_lengths = np.full((G,), Lref, dtype=np.int32)
    q = rng.integers(0, 4, size=(G, B, Lq)).astype(np.int8)
    t = rng.integers(0, 4, size=(G, B, Lt)).astype(np.int8)
    # make pair 0 of every region an exact hit so scores are predictable
    t[:, 0, :Lq] = q[:, 0]
    return reads, lengths, refs, ref_lengths, q, t


def test_region_step_sharded_matches_single():
    inputs = _tiny_inputs()
    single = make_region_step(mesh=None, k=9)
    mesh = make_mesh_2d()
    sharded = make_region_step(mesh=mesh, k=9)
    out_s = [np.asarray(x) for x in single(*inputs)]
    out_m = [np.asarray(x) for x in sharded(*inputs)]
    for a, b, name in zip(
        out_s, out_m, ["values", "counts", "scores", "q_end", "t_end"]
    ):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_region_step_scores_sane():
    inputs = _tiny_inputs()
    mesh = make_mesh_2d()
    step = make_region_step(mesh=mesh, k=9)
    _, _, scores, q_end, t_end = step(*inputs)
    scores = np.asarray(scores)
    # pair 0 in every region is an exact 16bp match: score 32
    assert (scores[:, 0] == 32).all()


def test_pack_region_batches():
    regions = []
    for i in range(5):
        seqs = [rand_seq(i * 10 + j, 80) for j in range(10 + i)]
        batch = ReadBatch.from_seqs(seqs)
        ref = encode_seq(rand_seq(1000 + i, 900))
        regions.append((f"G{i}", batch, ref))
    batches = pack_region_batches(regions, regions_per_batch=4)
    assert sum(b.names.count("") for b in batches) + sum(
        1 for b in batches for n in b.names if n
    ) == sum(len(b.names) for b in batches)
    packed_names = [n for b in batches for n in b.names if n]
    assert sorted(packed_names) == [f"G{i}" for i in range(5)]
    for b in batches:
        G, R, L = b.reads.shape
        assert G == 4
        assert b.refs.shape[0] == G
        for g in range(G):
            n = int(b.nreads[g])
            if b.names[g]:
                assert n > 0
                assert (b.lengths[g, :n] > 0).all()
            else:
                assert n == 0


def test_pack_groups_by_tier():
    small = [(f"S{i}", ReadBatch.from_seqs(["ACGT" * 20] * 8),
              encode_seq(rand_seq(i, 500))) for i in range(3)]
    big = [("BIG", ReadBatch.from_seqs(["ACGT" * 60] * 600),
            encode_seq(rand_seq(9, 7000)))]
    batches = pack_region_batches(small + big, regions_per_batch=8)
    shapes = {b.shape_key for b in batches}
    assert len(shapes) == 2  # big region did not inflate the small batch


# ---------------------------------------------------------- packed fetch

class _FakeBatch:
    def __init__(self, names):
        self.names = names


def _rand_outputs(rng, G, K, frac_valid=0.02):
    """Random [G,K] kmer-step outputs: mostly sentinel padding."""
    sent = np.uint32(0xFFFFFFFF)
    values = np.full((G, K), sent, dtype=np.uint32)
    counts = np.zeros((G, K), dtype=np.int32)
    for g in range(G):
        n = max(1, int(K * frac_valid))
        vals = rng.choice(K * 4, size=n, replace=False).astype(np.uint32)
        slots = rng.choice(K, size=n, replace=False)
        values[g, slots] = vals
        counts[g, slots] = rng.integers(1, 50, size=n).astype(np.int32)
    return values, counts


def test_packed_fetch_identity():
    """_compact_outputs + _postprocess_packed must reproduce the full
    fetch (_postprocess) exactly, per region."""
    from breakmer_tpu.parallel.kmer_batch import (
        _compact_outputs, _postprocess, _postprocess_packed,
    )

    rng = np.random.default_rng(7)
    G, K = 6, 512
    values, counts = _rand_outputs(rng, G, K)
    batch = _FakeBatch([f"R{g}" if g != 3 else "" for g in range(G)])
    full = _postprocess(batch, values, counts)
    vals, gcs, n = jax.jit(
        lambda v, c: _compact_outputs(v, c, G * 64)
    )(values, counts)
    assert int(n) >= 0
    packed = _postprocess_packed(
        batch, np.asarray(vals), np.asarray(gcs), int(n)
    )
    assert set(full) == set(packed)
    for name in full:
        np.testing.assert_array_equal(full[name][0], packed[name][0])
        np.testing.assert_array_equal(full[name][1], packed[name][1])


def test_packed_fetch_overflow_flag():
    """cap smaller than the valid-entry count must yield n=-1 (host then
    refetches full shapes), never a silently truncated buffer."""
    from breakmer_tpu.parallel.kmer_batch import _compact_outputs

    rng = np.random.default_rng(8)
    values, counts = _rand_outputs(rng, 4, 512, frac_valid=0.5)
    _v, _g, n = jax.jit(
        lambda v, c: _compact_outputs(v, c, 16)
    )(values, counts)
    assert int(n) == -1


def test_packed_fetch_giant_count_flag():
    """A count >= 2^24 would corrupt the gid field; the step must flag
    the batch for full refetch instead."""
    from breakmer_tpu.parallel.kmer_batch import _compact_outputs

    values = np.zeros((2, 8), dtype=np.uint32)
    counts = np.zeros((2, 8), dtype=np.int32)
    values[0, 0] = 123
    counts[0, 0] = 1 << 24
    _v, _g, n = jax.jit(
        lambda v, c: _compact_outputs(v, c, 64)
    )(values, counts)
    assert int(n) == -1
