"""Structural-equality pinning of the native greedy assembler.

assemble/greedy.py (Python, numpy) is the semantics oracle;
native/breakmer_native.cc nat_assemble is the warm-panel fast path. These
tests run both on randomized SV scenarios — including sequencing errors,
which exercise the mismatch gate and consensus-vote tie-breaks — and
assert the outputs are structurally identical: same contigs in the same
order, same consensus sequences, same (read index, offset, length)
placements, same sample-only k-mer lists.
"""

import random

import numpy as np
import pytest

from breakmer_tpu import native
from breakmer_tpu.assemble.greedy import assemble
from breakmer_tpu.encode import ReadBatch, encode_seq
from breakmer_tpu.ops.kmer import sample_only_kmers

pytestmark = pytest.mark.skipif(
    not native.available()
    or native.assemble_greedy(
        np.full((1, 20), 0, dtype=np.int8),
        np.array([20], dtype=np.int32),
        np.array([1], dtype=np.int64),
        15, 2, 20, 0.1,
    )
    is None,
    reason="native library (with nat_assemble) unavailable",
)


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _mutate(rng, seq, sub_rate=0.01):
    out = []
    for ch in seq:
        if rng.random() < sub_rate:
            out.append(rng.choice([c for c in "ACGT" if c != ch]))
        else:
            out.append(ch)
    return "".join(out)


def _scenario(seed):
    """Random region + random SV + tiled error-bearing reads."""
    rng = random.Random(seed)
    region = _rand_seq(rng, rng.randrange(300, 700))
    kind = rng.choice(["ins", "del", "dup", "none"])
    mid = len(region) // 2
    if kind == "ins":
        sample = region[:mid] + _rand_seq(rng, rng.randrange(15, 40)) + region[mid:]
    elif kind == "del":
        d = rng.randrange(30, 80)
        sample = region[: mid - d // 2] + region[mid + d // 2 :]
    elif kind == "dup":
        d = rng.randrange(25, 60)
        sample = region[:mid] + region[mid - d : mid] + region[mid:]
    else:
        sample = region
    read_len = rng.choice([36, 50, 76])
    step = rng.randrange(3, 9)
    reads = []
    for start in range(0, len(sample) - read_len + 1, step):
        r = sample[start : start + read_len]
        reads.append(_mutate(rng, r, sub_rate=rng.choice([0.0, 0.005, 0.02])))
    # a few reads with Ns to exercise the bad-window skipping
    for _ in range(3):
        r = list(rng.choice(reads))
        for _ in range(rng.randrange(1, 4)):
            r[rng.randrange(len(r))] = "N"
        reads.append("".join(r))
    return region, reads


def _both(seed, **kw):
    region, reads = _scenario(seed)
    batch = ReadBatch.from_seqs(reads)
    k = kw.pop("k", 15)
    values, counts = sample_only_kmers(
        batch.codes, batch.lengths, encode_seq(region), k,
        min_count=kw.pop("min_count", 2),
    )
    py = assemble(values, counts, batch, k, use_native=False, **kw)
    nat = assemble(values, counts, batch, k, use_native=True, **kw)
    return py, nat


def _assert_equal(py, nat):
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a.id == b.id
        assert a.seq == b.seq
        assert [(r.name, r.index, r.offset, r.length) for r in a.reads] == [
            (r.name, r.index, r.offset, r.length) for r in b.reads
        ]
        assert a.kmers == b.kmers


@pytest.mark.parametrize("seed", range(30))
def test_native_assemble_parity(seed):
    py, nat = _both(seed)
    _assert_equal(py, nat)


def test_native_assemble_parity_k11_strict_mismatch():
    py, nat = _both(1234, k=11, max_read_mismatch_frac=0.02)
    _assert_equal(py, nat)


def test_native_assemble_parity_high_min_reads():
    py, nat = _both(77, min_contig_reads=6, min_contig_len=40)
    _assert_equal(py, nat)


def test_native_assemble_k_over_16_falls_back():
    # the native envelope is k <= 16; the wrapper must return None so the
    # oracle path handles it (kmer_codes_np itself raises beyond uint32)
    out = native.assemble_greedy(
        np.zeros((2, 40), dtype=np.int8),
        np.array([40, 40], dtype=np.int32),
        np.array([5], dtype=np.int64),
        17, 2, 20, 0.1,
    )
    assert out is None
