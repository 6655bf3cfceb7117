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
