"""Hand-tiled Pallas TPU kernel for the anti-diagonal wavefront SW.

Same semantics as ops.sw.sw_score (tested for exact agreement, including
wavefront tie-breaking) but with the DP state held in VMEM scratch across
the whole diagonal sweep, one program per batch block:

  * state per step: two previous H diagonals (ping-ponged, no copies)
    plus E and F diagonals as [BB, Lq] VMEM arrays (BB pairs stacked on
    sublanes, query positions on lanes) — no HBM traffic in the sweep;
  * int16 state whenever scores fit (match*min(Lq,Lt) < 16000): half the
    vector registers per op vs int32, measured ~1.5x; int32 otherwise;
  * the target character stream needs no gather and no dynamic lane
    slicing (Mosaic cannot lower either): the diagonal's target slice
    t[d-i] evolves by one lane-shift per step, refilled from a rotating
    copy of the target whose column 0 always holds t[:, d+1];
  * best-cell tracking is branch-free per column (strictly-greater update
    keeps the earliest diagonal, matching the reference wavefront
    tie-break); the final cross-column pick minimizes (diagonal, lane)
    lexicographically among max-score columns, identical to argmax-first
    over the wavefront.

Scoring model (affine, gap of length g costs open + extend*g) and the
masking of pad/N bases match ops.sw exactly; ops.sw remains the oracle.

Bounds note: cells with j >= Lt or j < 0 need no explicit mask. The
streamed target is the pad code (4) there, so sub = NEG kills the match
path, and any H reachable through E/F gap chains is strictly smaller than
its in-bounds ancestor (every gap step subtracts >= gap_extend > 0), so
such cells can never win the strictly-greater best update. Only the
j == 0 boundary needs masking (there is no j = -1 column).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from breakmer_tpu.ops.sw import SWParams

NEG32 = -(1 << 28)
NEG16 = -(1 << 14)
# int16 state would halve vreg traffic, but this toolchain's Mosaic
# cannot lower lane rotates for non-32-bit vectors ("Rotate with
# non-32-bit data not implemented", tpu.dynamic_rotate on vector<...xi16>).
# The dtype machinery below stays; flip this limit positive when Mosaic
# gains 16-bit rotates.
I16_SCORE_LIMIT = -1


def _pick_bb(b: int, Lq: int, Lt: int, itemsize: int) -> int:
    """Pairs per program: large blocks amortize per-op issue cost,
    bounded by VMEM (6 state + best pair + rotating target + in/out
    blocks). Small batches keep small blocks to avoid padding waste."""
    budget = 10 * 1024 * 1024
    floor = 16 if itemsize == 2 else 8  # sublane tile minimum
    for bb in (512, 256, 128, 64, floor):
        if b >= max(bb, 48) or bb == floor:
            need = itemsize * bb * (8 * Lq + 2 * Lt) + 4 * bb * (Lq + Lt)
            if need <= budget:
                return bb
    return floor


def _shift_right(x: jax.Array, is0: jax.Array, fill) -> jax.Array:
    """new[:, i] = old[:, i-1]; new[:, 0] = fill (is0 = lane-0 mask)."""
    rolled = pltpu.roll(x, 1, 1)
    return jnp.where(is0, fill, rolled)


def _sw_kernel(
    q_ref, t_ref, score_ref, qend_ref, tend_ref,
    hd1, hd2, ed1, fd1, bh, bd, tj, trot,
    *, bb: int, Lq: int, Lt: int, params: SWParams, dt, neg: int,
):
    go = params.gap_open + params.gap_extend
    ge = params.gap_extend
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, Lq), 1)
    col_dt = col.astype(dt)
    is0 = col == 0

    qv = q_ref[:]
    q_bad = qv >= 4
    zero = jnp.zeros((bb, Lq), dt)
    hd1[:] = zero
    hd2[:] = zero
    ed1[:] = jnp.full((bb, Lq), neg, dt)
    fd1[:] = jnp.full((bb, Lq), neg, dt)
    bh[:] = zero
    bd[:] = zero
    # diagonal 0 target stream: t[0-i] -> only i=0 is a real base
    tj[:] = jnp.where(is0, t_ref[:, 0:1], 4)
    # rotating target: at unroll-iteration ``it``, column u holds the
    # stream fill t[:, it*U + u + 1]. One big rotate per U steps
    # (amortized ~Lt/U vreg-rolls per step instead of Lt — the per-step
    # whole-target roll was 35% of kernel time)
    trot[:] = pltpu.roll(t_ref[:], Lt - 1, 1)  # rotate left by 1

    def one_step(d, u, h_prev, h_prev2, h_out):
        isj0 = col == d
        d_dt = jnp.asarray(d, jnp.int32).astype(dt)
        tj_cur = tj[:]
        sub = jnp.where(
            q_bad | (tj_cur >= 4),
            neg,
            jnp.where(qv == tj_cur, params.match, -params.mismatch),
        ).astype(dt)
        h1 = h_prev[:]
        hg = h1 - go
        e_new = jnp.maximum(hg, ed1[:] - ge)
        e_new = jnp.where(isj0, neg, e_new)
        # shift(max(a,b)) == max(shift(a), shift(b)) with one roll
        f_new = _shift_right(jnp.maximum(hg, fd1[:] - ge), is0, neg)
        h_diag = _shift_right(h_prev2[:], is0, 0)
        h_diag = jnp.where(isj0, 0, h_diag)
        h_new = jnp.maximum(
            jnp.maximum(h_diag + sub, 0), jnp.maximum(e_new, f_new)
        )
        # strictly-greater update keeps the earliest diagonal per column
        upd = h_new > bh[:]
        bh[:] = jnp.where(upd, h_new, bh[:])
        bd[:] = jnp.where(upd, d_dt, bd[:])
        h_out[:] = h_new
        ed1[:] = e_new
        fd1[:] = f_new
        # advance the target stream: tj_{d+1}[i] = tj_d[i-1], new = t[d+1]
        # (static lane slice u of the rotated block — no dynamic indexing)
        fill = jnp.where(d + 1 < Lt, trot[:, u : u + 1], 4)
        tj[:] = _shift_right(tj_cur, is0, fill)

    U = 8  # unrolled steps per loop iteration (even: ping-pong pairs)

    def u_steps(it, _):
        base = it * U
        for u in range(U):  # static unroll
            if u % 2 == 0:
                one_step(base + u, u, hd1, hd2, hd2)
            else:
                one_step(base + u, u, hd2, hd1, hd1)
        trot[:] = pltpu.roll(trot[:], Lt - U, 1)  # rotate left by U
        return 0

    # trailing phantom steps (d >= Lq+Lt-1) are harmless: their target
    # stream is all-pad, so every H they produce is gap-chain-bounded
    # strictly below an earlier in-bounds cell and never passes the >
    # update (dpad covers the padded step count)
    jax.lax.fori_loop(0, (Lq + Lt - 1 + U - 1) // U, u_steps, 0)

    bh32 = bh[:].astype(jnp.int32)
    bd32 = bd[:].astype(jnp.int32)
    row_max = jnp.max(bh32, axis=1, keepdims=True)               # [BB, 1]
    # among max-score columns, minimize (diagonal, lane) lexicographically
    lqp = 1 << (Lq - 1).bit_length()
    combined = jnp.where(bh32 == row_max, bd32 * lqp + col, jnp.int32(2 ** 30))
    m = jnp.min(combined, axis=1, keepdims=True)
    i_star = m & (lqp - 1)
    d_star = m >> (lqp - 1).bit_length()
    j_star = d_star - i_star
    none = row_max <= 0
    score_ref[:] = jnp.where(none, 0, row_max)
    qend_ref[:] = jnp.where(none, -1, i_star)
    tend_ref[:] = jnp.where(none, -1, j_star)


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def sw_score_pallas(
    q: jax.Array,
    t: jax.Array,
    params: SWParams = SWParams(),
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for ops.sw.sw_score backed by the Pallas
    kernel. B is padded to a multiple of the block size internally; Lq
    should be a multiple of 128 for lane alignment (pad via pad_tier)."""
    B, Lq = q.shape
    Lt = t.shape[1]
    max_score = params.match * min(Lq, Lt)
    if max_score < I16_SCORE_LIMIT:
        dt, neg = jnp.int16, NEG16
    elif max_score < (1 << 28):
        dt, neg = jnp.int32, NEG32
    else:
        raise ValueError("score range exceeds int32")
    # the lex-combined (diagonal, lane) pick must fit int32
    lqp = 1 << (Lq - 1).bit_length()
    if (Lq + Lt) * lqp >= 2 ** 30:
        raise ValueError("Lq*Lt too large for int32 position packing")

    itemsize = jnp.dtype(dt).itemsize
    BB = _pick_bb(B, Lq, Lt, itemsize)
    Bp = ((B + BB - 1) // BB) * BB
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0)), constant_values=4)
        t = jnp.pad(t, ((0, Bp - B), (0, 0)), constant_values=4)

    kernel = functools.partial(
        _sw_kernel, bb=BB, Lq=Lq, Lt=Lt, params=params, dt=dt, neg=neg
    )
    grid = (Bp // BB,)
    score, qend, tend = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, Lq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Lt), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, Lq), dt),  # hd1
            pltpu.VMEM((BB, Lq), dt),  # hd2
            pltpu.VMEM((BB, Lq), dt),  # ed1
            pltpu.VMEM((BB, Lq), dt),  # fd1
            pltpu.VMEM((BB, Lq), dt),  # bh (best score per column)
            pltpu.VMEM((BB, Lq), dt),  # bd (its diagonal)
            pltpu.VMEM((BB, Lq), dt),  # tj (target stream)
            pltpu.VMEM((BB, Lt), dt),  # trot (rotating target)
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * Bp * Lq * (Lq + Lt),
            bytes_accessed=Bp * (Lq + Lt) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q.astype(dt), t.astype(dt))
    return score[:B, 0], qend[:B, 0], tend[:B, 0]
