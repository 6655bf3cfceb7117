"""Hand-tiled Pallas TPU kernel for the anti-diagonal wavefront SW.

Same semantics as ops.sw.sw_score (tested for exact agreement, including
wavefront tie-breaking) but with the DP state held in VMEM scratch across
the whole diagonal sweep, one program per batch block:

  * state per step: two previous H diagonals + previous E and F diagonals
    as [BB, Lq] int32 VMEM arrays (BB pairs stacked on sublanes, query
    positions on lanes) — no HBM traffic inside the sweep;
  * the target character stream needs no gather and no dynamic lane
    slicing (Mosaic cannot lower either for int32): the diagonal's target
    slice t[d-i] evolves by one lane-shift per step, refilled from a
    rotating copy of the target whose column 0 always holds t[:, d+1];
  * best-cell tracking is branch-free: key = H*DPAD + (DPAD-1-d) packs
    (score, earliest-diagonal) into one int32, so a plain running max
    reproduces the reference wavefront tie-break (earlier diagonal wins
    ties; first/smallest-i wins within a diagonal via argmax-first).

Scoring model (affine, gap of length g costs open + extend*g) and the
masking of pad/N bases match ops.sw exactly; ops.sw remains the oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from breakmer_tpu.ops.sw import NEG, SWParams

def _pick_bb(b: int) -> int:
    """Pairs per program: large blocks amortize per-op issue cost (more
    vregs touched per VPU instruction); small batches keep BB=8 to avoid
    padding waste."""
    return 64 if b >= 48 else 8


def _shift_right(x: jax.Array, is0: jax.Array, fill) -> jax.Array:
    """new[:, i] = old[:, i-1]; new[:, 0] = fill (is0 = lane-0 mask)."""
    rolled = pltpu.roll(x, 1, 1)
    return jnp.where(is0, fill, rolled)


def _sw_kernel(
    q_ref, t_ref, score_ref, qend_ref, tend_ref,
    hd1, hd2, ed1, fd1, key, tj, trot,
    *, bb: int, Lq: int, Lt: int, params: SWParams, dpad_log2: int,
):
    DPAD = 1 << dpad_log2
    go = params.gap_open + params.gap_extend
    ge = params.gap_extend
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, Lq), 1)
    is0 = col == 0

    qv = q_ref[:]
    # substitution profile is fixed per cell EXCEPT the target base, which
    # streams through; precompute the query-invalid mask once
    q_bad = qv >= 4
    hd1[:] = jnp.zeros((bb, Lq), jnp.int32)
    hd2[:] = jnp.zeros((bb, Lq), jnp.int32)
    ed1[:] = jnp.full((bb, Lq), NEG, jnp.int32)
    fd1[:] = jnp.full((bb, Lq), NEG, jnp.int32)
    key[:] = jnp.zeros((bb, Lq), jnp.int32)
    # diagonal 0 target stream: t[0-i] -> only i=0 is a real base
    tj[:] = jnp.where(is0, t_ref[:, 0:1], 4)
    # rotating target buffer: column 0 always holds the NEXT base to feed
    # into the stream (t[:, d+1] at step d) — static slices + rolls only;
    # TPU Pallas cannot lower per-step dynamic lane loads
    trot[:] = pltpu.roll(t_ref[:], Lt - 1, 1)  # rotate left by 1

    # NOTE on bounds: cells with j >= Lt or j < 0 need no explicit mask.
    # The streamed target is the pad code (4) there, so sub = NEG kills
    # the match path, and any H reachable through E/F chains is strictly
    # smaller than its in-bounds ancestor (every gap step subtracts
    # >= gap_extend > 0), so such cells can never win the running max.
    # Only the j == 0 boundary needs masking (no j = -1 column exists).
    def step(d, _):
        isj0 = col == d  # j_idx == 0
        tj_cur = tj[:]
        sub = jnp.where(
            q_bad | (tj_cur >= 4),
            NEG,
            jnp.where(qv == tj_cur, params.match, -params.mismatch),
        )
        h1 = hd1[:]
        hg = h1 - go
        e_new = jnp.maximum(hg, ed1[:] - ge)
        e_new = jnp.where(isj0, NEG, e_new)
        # shift(max(a,b)) == max(shift(a),shift(b)) with a shared NEG fill:
        # one roll instead of two
        f_new = _shift_right(jnp.maximum(hg, fd1[:] - ge), is0, NEG)
        h_diag = _shift_right(hd2[:], is0, 0)
        h_diag = jnp.where(isj0, 0, h_diag)
        h_new = jnp.maximum(
            jnp.maximum(h_diag + sub, 0), jnp.maximum(e_new, f_new)
        )
        # branch-free best tracking: larger H wins; ties keep earlier d
        key[:] = jnp.maximum(key[:], (h_new << dpad_log2) + (DPAD - 1 - d))
        hd2[:] = h1
        hd1[:] = h_new
        ed1[:] = e_new
        fd1[:] = f_new
        # advance the target stream: tj_{d+1}[i] = tj_d[i-1], new = t[d+1]
        fill = jnp.where(d + 1 < Lt, trot[:, 0:1], 4)
        tj[:] = _shift_right(tj_cur, is0, fill)
        trot[:] = pltpu.roll(trot[:], Lt - 1, 1)
        return 0

    jax.lax.fori_loop(0, Lq + Lt - 1, step, 0)

    keys = key[:]
    row_max = jnp.max(keys, axis=1, keepdims=True)              # [BB, 1]
    # argmax is float-only in Mosaic; min-index-of-max via masked min
    col_out = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    i_star = jnp.min(
        jnp.where(keys == row_max, col_out, Lq), axis=1, keepdims=True
    )
    score = row_max >> dpad_log2
    d_star = (DPAD - 1) - (row_max & (DPAD - 1))
    j_star = d_star - i_star
    none = score <= 0
    score_ref[:] = jnp.where(none, 0, score)
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
    kernel. B is padded to a multiple of BB internally; Lq should be a
    multiple of 128 for lane alignment (callers pad via pad_tier)."""
    B, Lq = q.shape
    Lt = t.shape[1]
    steps = Lq + Lt - 1
    dpad_log2 = max(1, (steps - 1).bit_length())
    if params.match * min(Lq, Lt) >= (1 << (31 - dpad_log2)):
        raise ValueError("score range overflows int32 key packing")

    BB = _pick_bb(B)
    Bp = ((B + BB - 1) // BB) * BB
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0)), constant_values=4)
        t = jnp.pad(t, ((0, Bp - B), (0, 0)), constant_values=4)

    kernel = functools.partial(
        _sw_kernel, bb=BB, Lq=Lq, Lt=Lt, params=params, dpad_log2=dpad_log2
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
            pltpu.VMEM((BB, Lq), jnp.int32),  # hd1
            pltpu.VMEM((BB, Lq), jnp.int32),  # hd2
            pltpu.VMEM((BB, Lq), jnp.int32),  # ed1
            pltpu.VMEM((BB, Lq), jnp.int32),  # fd1
            pltpu.VMEM((BB, Lq), jnp.int32),  # key
            pltpu.VMEM((BB, Lq), jnp.int32),  # tj
            pltpu.VMEM((BB, Lt), jnp.int32),  # trot
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * Bp * Lq * (Lq + Lt),
            bytes_accessed=Bp * (Lq + Lt) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q.astype(jnp.int32), t.astype(jnp.int32))
    return score[:B, 0], qend[:B, 0], tend[:B, 0]
