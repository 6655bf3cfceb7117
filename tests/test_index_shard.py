"""Mesh-sharded genome index (parallel/index_shard.py) vs the replicated
GenomeIndex: candidate windows must be IDENTICAL (the sharded lookup +
shared clustering path is the gfServer-socket replacement; SURVEY.md §2b
index-sharding v2). Runs on the 8-virtual-device CPU mesh (conftest)."""

import numpy as np
import pytest

from breakmer_tpu.align.index import GenomeIndex
from breakmer_tpu.encode import encode_seq
from breakmer_tpu.parallel.index_shard import ShardedGenomeIndex, make_shard_mesh
from tests.fixtures import rand_seq


@pytest.fixture(scope="module")
def genome_pair():
    genome = {
        "chr1": rand_seq(11, 30_000),
        "chr2": rand_seq(12, 20_000),
        "chr3": rand_seq(13, 8_000),
    }
    gi = GenomeIndex(genome, k=11)
    si = ShardedGenomeIndex(gi, make_shard_mesh())
    return genome, gi, si


def _win_key(w):
    return (w.chrom, w.t_start, w.t_end, w.strand, w.nseeds)


def test_sharded_candidates_match_replicated(genome_pair):
    genome, gi, si = genome_pair
    rng = np.random.default_rng(3)
    for trial in range(12):
        chrom = ("chr1", "chr2", "chr3")[trial % 3]
        seq = genome[chrom]
        start = int(rng.integers(0, len(seq) - 400))
        contig = seq[start : start + 250]
        if trial % 4 == 1:  # revcomp contigs hit the '-' path
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            contig = "".join(comp[b] for b in reversed(contig))
        if trial % 4 == 2:  # split contig: two loci (translocation shape)
            other = genome["chr2"]
            contig = contig[:125] + other[5_000:5_125]
        q = encode_seq(contig)
        want = [_win_key(w) for w in gi.candidates(q)]
        got = [_win_key(w) for w in si.candidates(q)]
        assert got == want, f"trial {trial}"


def test_sharded_lookup_spans_shard_boundaries(genome_pair):
    # a k-mer whose hits straddle shard boundaries must return the union
    genome, gi, si = genome_pair
    # plant the same 11-mer many times across chroms
    probe = "ACGTACGTACG"
    from breakmer_tpu.ops.kmer import str_to_kmer
    hits_expected = []
    for chrom in gi.chroms:
        pos = gi.lookup_chrom(chrom, str_to_kmer(probe))
        hits_expected.extend((chrom, int(p)) for p in pos)
    qi, cid, tp = si.lookup(np.array([str_to_kmer(probe)], dtype=np.int64))
    got = sorted((si.chroms[int(c)], int(p)) for c, p in zip(cid, tp))
    assert got == sorted(hits_expected)


def test_sharded_overflow_raises():
    # 2000 copies of one k-mer in one chromosome with uncapped seeds:
    # a single shard holds > h_pad hits -> explicit overflow, not silence
    genome = {"chrR": "ACGTACGTACG" * 400}
    gi = GenomeIndex(genome, k=11, max_hits_per_seed=0)  # uncapped build
    si = ShardedGenomeIndex(gi, make_shard_mesh(), h_pad=64)
    from breakmer_tpu.ops.kmer import str_to_kmer
    with pytest.raises(OverflowError):
        si.lookup(np.array([str_to_kmer("ACGTACGTACG")], dtype=np.int64))


def test_sharded_empty_query(genome_pair):
    _, _, si = genome_pair
    qi, cid, tp = si.lookup(np.empty(0, dtype=np.int64))
    assert len(qi) == len(cid) == len(tp) == 0
    assert si.candidates(encode_seq("ACGT" * 3)) == []


def test_sharded_hpad_autosizes_for_multichrom_repeats():
    # review repro: a seed at the per-chrom cap on >=3 chromosomes lands
    # as one contiguous run after the global code sort; auto h_pad must
    # hold it (a fixed 128 overflowed)
    probe = "ACGTACGTACG"
    genome = {
        f"chr{i}": (probe + rand_seq(40 + i, 9)) * 70 for i in range(1, 4)
    }
    gi = GenomeIndex(genome, k=11)
    si = ShardedGenomeIndex(gi, make_shard_mesh())
    q = encode_seq(probe + "TTTTGGGGCCCCAAAA")
    want = [_win_key(w) for w in gi.candidates(q)]
    got = [_win_key(w) for w in si.candidates(q)]
    assert got == want
