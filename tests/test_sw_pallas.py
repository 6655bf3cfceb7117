"""Pallas wavefront kernel vs the jit-level oracle (interpret mode on CPU;
the same kernel compiles natively on TPU — exercised by bench.py)."""

import numpy as np
import pytest

from breakmer_tpu.encode import ReadBatch
from breakmer_tpu.ops.sw import SWParams, sw_score
from breakmer_tpu.ops.sw_pallas import sw_score_pallas
from tests.test_sw import CASES, _pairs_to_batches, _random_cases


def _run_both(q, t, params=SWParams()):
    import jax.numpy as jnp

    ref = [np.asarray(x) for x in sw_score(jnp.asarray(q), jnp.asarray(t), params)]
    got = [
        np.asarray(x)
        for x in sw_score_pallas(jnp.asarray(q), jnp.asarray(t), params,
                                 interpret=True)
    ]
    return ref, got


def test_pallas_matches_jit_cases():
    pairs = CASES + _random_cases(8)
    q, t = _pairs_to_batches(pairs, pad_q=128, pad_t=128)
    ref, got = _run_both(q, t)
    for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_pallas_unaligned_batch():
    # B=3 not a multiple of the BB block — internal padding must be exact
    pairs = CASES[:3]
    q, t = _pairs_to_batches(pairs, pad_q=128, pad_t=256)
    ref, got = _run_both(q, t)
    for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_pallas_rect_shapes():
    rng = np.random.default_rng(3)
    qs = ["".join(rng.choice(list("ACGT"), 100)) for _ in range(16)]
    ts = ["".join(rng.choice(list("ACGT"), 300)) for _ in range(16)]
    # plant exact copies so some pairs align fully
    for i in range(0, 16, 4):
        ts[i] = ts[i][:50] + qs[i] + ts[i][150:]
    q = ReadBatch.from_seqs(qs, pad_to=128).codes
    t = ReadBatch.from_seqs(ts, pad_to=384).codes
    ref, got = _run_both(q, t)
    for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)
    assert (got[0][::4] >= 200).all()  # planted exact hits


def test_pallas_custom_params():
    params = SWParams(match=3, mismatch=2, gap_open=4, gap_extend=2)
    pairs = CASES
    q, t = _pairs_to_batches(pairs, pad_q=128, pad_t=128)
    ref, got = _run_both(q, t, params)
    np.testing.assert_array_equal(ref[0], got[0])


def test_pallas_score_overflow_guard():
    import jax.numpy as jnp

    q = jnp.zeros((8, 8192), dtype=jnp.int8)
    t = jnp.zeros((8, 8192), dtype=jnp.int8)
    with pytest.raises(ValueError, match="int32"):
        sw_score_pallas(q, t, SWParams(match=2 ** 16))
