import numpy as np

from breakmer_tpu.encode import ReadBatch
from breakmer_tpu.ops.sw import SWParams, sw_score_batch
from tests.oracles import oracle_sw


def _pairs_to_batches(pairs, pad_q=None, pad_t=None):
    qs = [p[0] for p in pairs]
    ts = [p[1] for p in pairs]
    qb = ReadBatch.from_seqs(qs, pad_to=pad_q)
    tb = ReadBatch.from_seqs(ts, pad_to=pad_t)
    return qb.codes, tb.codes


CASES = [
    ("ACGT", "ACGT"),                       # exact
    ("ACGT", "TTTTACGTTTTT"),               # embedded
    ("ACGTACGT", "ACGAACGT"),               # one mismatch
    ("AAAATTTTGGGG", "AAAAGGGG"),           # query insertion
    ("AAAAGGGG", "AAAATTTTGGGG"),           # query deletion
    ("GGGG", "CCCC"),                       # nothing aligns
    ("ACGTACGTAC", "GTACGTACGT"),           # offset overlap
    ("ACACACAC", "ACACAC"),                 # repeat
    ("ACNGT", "ACNGT"),                     # N never matches
]


def _random_cases(n=16, seed=42):
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(n):
        lq = int(rng.integers(5, 40))
        lt = int(rng.integers(5, 60))
        pairs.append((
            "".join(rng.choice(list("ACGT"), lq)),
            "".join(rng.choice(list("ACGT"), lt)),
        ))
    return pairs


def test_sw_vs_oracle_batched():
    """All cases in ONE padded batch (one XLA compile): scores and end
    positions must match the triple-loop oracle; padding must not change
    anything (each pair has a different true length)."""
    pairs = CASES + _random_cases()
    q, t = _pairs_to_batches(pairs, pad_q=64, pad_t=64)
    score, qe, te = sw_score_batch(q, t)
    for b, (qi, ti) in enumerate(pairs):
        exp_score, exp_qe, exp_te = oracle_sw(qi, ti)
        assert score[b] == exp_score, f"case {b}: {qi} vs {ti}"
        if exp_score > 0:
            assert (qe[b], te[b]) == (exp_qe, exp_te), f"case {b}: {qi} vs {ti}"
        else:
            assert (qe[b], te[b]) == (-1, -1)


def test_default_scoring_scale_pinned():
    """The production scoring scale is an explicit contract: the SW
    oracle tracks SWParams() (so kernel-vs-oracle tests stay coherent
    under deliberate scale changes), which means an ACCIDENTAL default
    change would no longer fail those tests — this pin is the tripwire.
    Change it only together with full sweep revalidation (r4: a 4x
    long-gap-friendly default was tried and broke translocation
    termination; the scale is load-bearing)."""
    from breakmer_tpu.config import Config

    assert SWParams() == (2, 3, 5, 1)
    cfg = Config()
    assert (cfg.match_score, cfg.mismatch_pen, cfg.gap_open_pen,
            cfg.gap_extend_pen) == (2, 3, 5, 1)


def test_sw_custom_params():
    params = SWParams(match=1, mismatch=1, gap_open=2, gap_extend=1)
    pairs = CASES
    q, t = _pairs_to_batches(pairs, pad_q=16, pad_t=16)
    score, _, _ = sw_score_batch(q, t, params)
    for b, (qi, ti) in enumerate(pairs):
        exp, _, _ = oracle_sw(qi, ti, 1, 1, 2, 1)
        assert score[b] == exp, f"case {b}: {qi} vs {ti}"
