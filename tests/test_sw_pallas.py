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


def _run_fast(q, t, params=SWParams()):
    import jax.numpy as jnp

    ref = [np.asarray(x) for x in sw_score(jnp.asarray(q), jnp.asarray(t), params)]
    got = [
        np.asarray(x)
        for x in sw_score_pallas(jnp.asarray(q), jnp.asarray(t), params,
                                 interpret=True, no_n=True)
    ]
    return ref, got


def test_pallas_no_n_matches_oracle():
    # ragged lengths -> trailing pad 4s everywhere; no mid-sequence N.
    # The no_n path must still be bit-exact against the NEG-masking oracle.
    pairs = CASES + _random_cases(8)
    pairs = [(a.replace("N", "A"), b.replace("N", "A")) for a, b in pairs]
    q, t = _pairs_to_batches(pairs, pad_q=128, pad_t=256)
    ref, got = _run_fast(q, t)
    for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_pallas_no_n_rect_and_params():
    rng = np.random.default_rng(7)
    qs = ["".join(rng.choice(list("ACGT"), int(n))) for n in rng.integers(40, 120, 12)]
    ts = ["".join(rng.choice(list("ACGT"), int(n))) for n in rng.integers(150, 300, 12)]
    for i in range(0, 12, 3):
        ts[i] = ts[i][:30] + qs[i] + ts[i][30:]
    q = ReadBatch.from_seqs(qs, pad_to=128).codes
    t = ReadBatch.from_seqs(ts, pad_to=512).codes
    for params in (SWParams(), SWParams(match=3, mismatch=2, gap_open=4, gap_extend=2)):
        ref, got = _run_fast(q, t, params)
        for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_pallas_no_n_falls_back_when_params_unsafe():
    # mismatch == 0 voids the pad-never-wins proof; the wrapper must
    # silently ignore no_n and still agree with the oracle even with Ns.
    params = SWParams(match=2, mismatch=0, gap_open=5, gap_extend=1)
    pairs = CASES + _random_cases(4)
    q, t = _pairs_to_batches(pairs, pad_q=128, pad_t=128)
    ref, got = _run_fast(q, t, params)
    for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_pallas_phase_boundaries():
    # Lq == Lt and Lt >> Lq exercise every (mask, fill) phase layout,
    # including empty 'real' ranges and the guard block at d == Lt-1.
    rng = np.random.default_rng(11)
    for pad_q, pad_t in ((128, 128), (128, 1024), (256, 384)):
        qs = ["".join(rng.choice(list("ACGT"), 90)) for _ in range(4)]
        ts = ["".join(rng.choice(list("ACGT"), pad_t - 10)) for _ in range(4)]
        ts[1] = ts[1][:40] + qs[1] + ts[1][40 + 90:]
        q = ReadBatch.from_seqs(qs, pad_to=pad_q).codes
        t = ReadBatch.from_seqs(ts, pad_to=pad_t).codes
        ref, got = _run_both(q, t)
        for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
            np.testing.assert_array_equal(a, b, err_msg=f"{name} {pad_q}x{pad_t}")


def test_pallas_score_overflow_guard():
    import jax.numpy as jnp

    q = jnp.zeros((8, 8192), dtype=jnp.int8)
    t = jnp.zeros((8, 8192), dtype=jnp.int8)
    with pytest.raises(ValueError, match="int32"):
        sw_score_pallas(q, t, SWParams(match=2 ** 16))


def test_vmem_guard_beyond_budget_raises_and_dispatch_falls_back():
    """VERDICT r1 weak #4: a shape past the VMEM budget must fail loudly
    from the kernel entry, and the auto dispatcher must route it to the
    XLA scan instead (same results, no VMEM blowup)."""
    from breakmer_tpu.ops.sw_pallas import _pick_bb, pallas_shape_ok

    # 4096-long contig vs 8192 window: within budget, must be launchable
    assert pallas_shape_ok(4096, 8192)
    assert _pick_bb(8, 4096, 8192, 4) >= 8
    # far beyond budget: floor block alone needs > 10 MiB
    assert not pallas_shape_ok(32768, 65536)
    with pytest.raises(ValueError, match="VMEM budget"):
        _pick_bb(8, 32768, 65536, 4)
    # the lex-packing limit is also part of launchability
    assert not pallas_shape_ok(1 << 14, (1 << 16) + (1 << 15))


def _run_chunked(q, t, chunk, params=SWParams(), no_n=False):
    import jax.numpy as jnp

    ref = [np.asarray(x) for x in sw_score(jnp.asarray(q), jnp.asarray(t), params)]
    got = [
        np.asarray(x)
        for x in sw_score_pallas(jnp.asarray(q), jnp.asarray(t), params,
                                 interpret=True, no_n=no_n, target_chunk=chunk)
    ]
    return ref, got


def test_pallas_chunked_matches_oracle():
    """Target-chunked long-DP path (SURVEY §2b blockwise/tiled DP):
    forced 128-wide chunks over a 512 target (C=4) must be bit-exact
    with the oracle, including hits that STRADDLE chunk boundaries."""
    rng = np.random.default_rng(21)
    qs = ["".join(rng.choice(list("ACGT"), 100)) for _ in range(8)]
    ts = ["".join(rng.choice(list("ACGT"), 500)) for _ in range(8)]
    # plant hits across each internal chunk boundary (j = 128, 256, 384)
    for i, j0 in enumerate((80, 200, 340, 460)):
        ts[i] = ts[i][:j0] + qs[i] + ts[i][j0 + 100:]
        ts[i] = ts[i][:500]
    q = ReadBatch.from_seqs(qs, pad_to=128).codes
    t = ReadBatch.from_seqs(ts, pad_to=512).codes
    ref, got = _run_chunked(q, t, 128)
    for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)
    assert (got[0][:3] >= 180).all()  # planted hits found across boundaries


def test_pallas_chunked_tie_breaks():
    """Tie-heavy inputs (2-letter alphabet, cheap gaps): the carried
    boundary + fenced best update must preserve the oracle's earliest-
    (diagonal, lane) tie-break even when equal-score cells appear in
    different chunks."""
    rng = np.random.default_rng(22)
    q = rng.integers(0, 2, (16, 128), dtype=np.int8)
    t = rng.integers(0, 2, (16, 384), dtype=np.int8)
    for params in (SWParams(), SWParams(match=1, mismatch=1, gap_open=0, gap_extend=1)):
        ref, got = _run_chunked(q, t, 128, params)
        for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_pallas_chunked_no_n_and_boundary_n():
    """no_n fast path under chunking, plus generic path with a
    mid-sequence N run placed exactly on a chunk boundary."""
    rng = np.random.default_rng(23)
    qs = ["".join(rng.choice(list("ACGT"), int(n))) for n in rng.integers(60, 120, 8)]
    ts = ["".join(rng.choice(list("ACGT"), int(n))) for n in rng.integers(300, 380, 8)]
    for i in range(0, 8, 2):
        ts[i] = ts[i][:120] + qs[i] + ts[i][120:]
    q = ReadBatch.from_seqs(qs, pad_to=128).codes
    t = ReadBatch.from_seqs(ts, pad_to=384).codes
    ref, got = _run_chunked(q, t, 128, no_n=True)
    for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg="no_n " + name)
    # generic path: N run straddling j == 128
    t2 = np.array(t)
    t2[:, 124:132] = 4
    ref, got = _run_chunked(q, t2, 128)
    for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg="boundary-N " + name)


def test_pallas_chunked_uneven_tail():
    # Lt=320 with chunk 128 -> C=3, last chunk half pad; wrapper pads to
    # 384 with code 4 and the pad-never-wins argument must hold
    rng = np.random.default_rng(24)
    qs = ["".join(rng.choice(list("ACGT"), 90)) for _ in range(4)]
    ts = ["".join(rng.choice(list("ACGT"), 320)) for _ in range(4)]
    ts[1] = ts[1][:230] + qs[1] + ts[1][230:]
    ts[1] = ts[1][:320]  # hit runs into the final (padded) chunk
    q = ReadBatch.from_seqs(qs, pad_to=128).codes
    t = ReadBatch.from_seqs(ts, pad_to=320).codes
    ref, got = _run_chunked(q, t, 128)
    for name, a, b in zip(("score", "q_end", "t_end"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_chunked_shape_ok_and_auto_decision():
    """Shapes where only chunking fits VMEM are now launchable; the
    auto decision picks the chunked grid (Tc == _T_CHUNK) there and the
    direct launch for in-budget shapes."""
    from breakmer_tpu.ops.sw_pallas import _T_CHUNK, _pick_bb, pallas_shape_ok

    # 1 Mbp target vs 512 query: direct launch blows VMEM at any block,
    # the chunked grid fits comfortably
    assert pallas_shape_ok(512, 1_000_000)
    with pytest.raises(ValueError, match="VMEM budget"):
        _pick_bb(8, 512, 1_000_000, 4)
    assert _pick_bb(8, 512, _T_CHUNK, 4, chunked=True) >= 8
    # both-dims-huge still refuses (query dim is not chunked)
    assert not pallas_shape_ok(32768, 65536)
    # lex packing limit still enforced with the chunk-padded Lt
    assert not pallas_shape_ok(1 << 14, (1 << 16) + (1 << 15))


def test_chunk_decision_survives_one_sided_probe_failures():
    """The auto decision must not die when only ONE launch form fits the
    VMEM floor: huge-Lq shapes fit direct but not the 10-state chunked
    probe (and vice versa); only both-infeasible raises. And
    pallas_shape_ok must judge the direct form by ITS OWN (unpadded)
    int32 packing bound."""
    from breakmer_tpu.ops.sw_pallas import _T_CHUNK, _choose_chunk, pallas_shape_ok

    # direct fits (8.85 MB), chunked probe would exceed (10.76 MB):
    # decision must pick direct instead of raising
    assert _choose_chunk(64, 30000, 2176, 4) == 2176
    assert pallas_shape_ok(30000, 2176)
    # chunked fits, direct doesn't: picks the chunk width
    assert _choose_chunk(8, 512, 1_000_000, 4) == _T_CHUNK
    # neither fits: raises (and shape_ok is False)
    with pytest.raises(ValueError, match="both"):
        _choose_chunk(8, 32768, 65536, 4)
    # direct launch passes its own packing bound even though the
    # chunk-rounded bound would be exactly 2^30 (r2 review finding)
    assert pallas_shape_ok(16384, 48000)


def test_auto_dispatch_runs_beyond_tier_shape():
    """A beyond-tier contig (pad_tier rounds past the largest tier) still
    produces correct scores through sw_score_auto (CPU here -> scan path;
    on TPU the pallas_shape_ok gate picks the same scan for huge shapes)."""
    from breakmer_tpu.ops.sw import sw_score_auto

    rng = np.random.default_rng(5)
    qs = "".join(rng.choice(list("ACGT"), 3000))
    q = ReadBatch.from_seqs([qs], pad_to=4096).codes
    t = ReadBatch.from_seqs([qs[500:2500]], pad_to=4096).codes
    s, qe, te = (np.asarray(x) for x in sw_score_auto(q, t))
    from breakmer_tpu.ops.sw import SWParams
    assert int(s[0]) == SWParams().match * 2000  # exact 2000-bp match
    assert int(qe[0]) == 2499 and int(te[0]) == 1999
