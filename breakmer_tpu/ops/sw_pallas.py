"""Hand-tiled Pallas TPU kernel for the anti-diagonal wavefront SW.

Same semantics as ops.sw.sw_score (tested for exact agreement, including
wavefront tie-breaking) but with the DP state held in VMEM scratch across
the whole diagonal sweep, one program per batch block:

  * state per step: two previous H diagonals (ping-ponged, no copies)
    plus E and F diagonals as [BB, Lq] VMEM arrays (BB pairs stacked on
    sublanes, query positions on lanes) — no HBM traffic in the sweep;
  * the target character stream needs no gather and no dynamic lane
    slicing (Mosaic cannot lower either): the diagonal's target slice
    t[d-i] evolves by one lane-shift per step, refilled from a rotating
    copy of the target whose column u holds the step's fill character;
  * the sweep is split into static phases so each per-step op is emitted
    only over the diagonals where it can matter: the j==0 boundary masks
    die after d >= Lq, the target-stream fill guard only exists in the
    one unroll block straddling d == Lt-1, and past it the rotating
    target (and its per-block roll) is dropped entirely;
  * ``no_n=True`` (static) asserts no mid-sequence N in either input:
    pads are re-encoded to distinct never-matching codes (q->6, t->7) and
    the 5-op masked substitution select collapses to compare+select.
    Bit-exact with the oracle (proof below); requires mismatch > 0 and
    gap_extend > 0 (silently ignored otherwise);
  * best-cell tracking is branch-free per column (strictly-greater update
    keeps the earliest diagonal, matching the reference wavefront
    tie-break); the final cross-column pick minimizes (diagonal, lane)
    lexicographically among max-score columns, identical to argmax-first
    over the wavefront.

Scoring model (affine, gap of length g costs open + extend*g) and the
masking of pad/N bases match ops.sw exactly; ops.sw remains the oracle.

Bounds note (generic path): cells with j >= Lt or j < 0 need no explicit
mask. The streamed target is the pad code there, so sub = NEG kills the
match path, and any H reachable through E/F gap chains is strictly
smaller than its in-bounds ancestor (every gap step subtracts >=
gap_extend > 0), so such cells can never win the strictly-greater best
update. Only the j == 0 boundary needs masking (there is no j = -1
column).

no_n exactness proof sketch: with pads re-encoded to 6 (query) / 7
(target), no pad lane ever equals any base or the other side's pad, so
sub = -mismatch < 0 at every pad-touching cell. DP paths only move i and
j forward, so once a path enters a pad row/column it never returns to
valid cells; inside the pad region H cannot grow (match impossible, gap
chains subtract gap_extend > 0, the 0-floor only resets), hence every
positive pad-cell H is STRICTLY below some in-bounds ancestor's H and can
neither beat nor tie the global max. The (score, q_end, t_end) outputs —
the only observables — are therefore identical to the oracle's NEG
masking; only unobservable pad-cell values differ.
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
# int16 state would halve vreg traffic, but it is blocked on this target
# at a deeper level than the lane rotate: (a) tpu.dynamic_rotate has no
# 16-bit lowering — WORKED AROUND via _roll_lanes (pltpu.bitcast packs
# pairs of BATCH rows per i32 lane, leaving lanes unpacked, so an i32
# lane roll IS the i16 lane roll; verified bit-exact on hardware) — but
# (b) 16-bit vector COMPARISONS do not lower at all ("Target does not
# support this comparison", v5e Mosaic), which kills sub/tie-break/
# stream selects; arithmetic 0/1-indicator replacements cost back ~all
# of the halved-vreg win. Flip this limit positive only on a toolchain
# whose Mosaic lowers 16-bit compares.
I16_SCORE_LIMIT = -1


_VMEM_BUDGET = 10 * 1024 * 1024
# per-chunk target width for the blockwise/tiled long-DP path (SURVEY §2b
# "sequence dimension": arbitrarily long targets in fixed VMEM blocks);
# equals the top pad tier so pad_tier'd beyond-tier shapes chunk evenly
_T_CHUNK = 2048


def _block_need(bb: int, Lq: int, Lt: int, itemsize: int, chunked: bool = False) -> int:
    """VMEM bytes for one program at block size bb: 6 state + best pair
    (+2 boundary columns when target-chunked) + rotating target
    ([bb, Lq/Lt] at itemsize) + in/out blocks (int8 in, state-dtype out,
    approximated at 4B/elem)."""
    nstate = 10 if chunked else 8
    return itemsize * bb * (nstate * Lq + 2 * Lt) + 4 * bb * (Lq + Lt)


def pallas_shape_ok(Lq: int, Lt: int, itemsize: int = 4) -> bool:
    """True iff this (Lq, Lt) can launch at all: the floor block fits the
    VMEM budget — directly, or via the target-chunked grid when Lt alone
    is what breaks the budget — and the lex position packing fits int32.
    Each launch form is checked against ITS OWN packing bound (the direct
    launch does not pad Lt to the chunk width). Dispatchers
    (ops.sw.sw_score_auto) route to the XLA scan oracle when False
    instead of blowing VMEM (VERDICT r1 weak #4)."""
    floor = 16 if itemsize == 2 else 8
    lqp = 1 << (max(Lq, 1) - 1).bit_length()
    direct_ok = (
        _block_need(floor, Lq, Lt, itemsize) <= _VMEM_BUDGET
        and (Lq + Lt) * lqp < 2 ** 30
    )
    lt_pad = -(-Lt // _T_CHUNK) * _T_CHUNK
    chunk_ok = (
        _block_need(floor, Lq, min(Lt, _T_CHUNK), itemsize, chunked=True)
        <= _VMEM_BUDGET
        and (Lq + lt_pad) * lqp < 2 ** 30
    )
    return direct_ok or chunk_ok


def _pick_bb(b: int, Lq: int, Lt: int, itemsize: int, chunked: bool = False) -> int:
    """Pairs per program: large blocks amortize per-op issue cost,
    bounded by VMEM (6 state + best pair + rotating target + in/out
    blocks). Small batches keep small blocks to avoid padding waste.
    Raises (rather than silently launching an over-budget block) when
    even the floor block exceeds the budget."""
    floor = 16 if itemsize == 2 else 8  # sublane tile minimum
    for bb in (512, 256, 128, 64, floor):
        if b >= max(bb, 48) or bb == floor:
            if _block_need(bb, Lq, Lt, itemsize, chunked) <= _VMEM_BUDGET:
                return bb
    raise ValueError(
        f"SW pallas shape Lq={Lq}, Lt={Lt} exceeds the {_VMEM_BUDGET >> 20} MiB "
        f"VMEM budget even at the minimum block ({floor}); use the XLA scan "
        f"path (ops.sw.sw_score) for this shape — see pallas_shape_ok."
    )


def _choose_chunk(b: int, Lq: int, Lt: int, itemsize: int) -> int:
    """Auto chunk-width decision: direct (Tc == Lt) when it fits VMEM at
    a block size no smaller than the chunked grid would get, else
    ``_T_CHUNK``-wide chunks. EITHER probe may fail its VMEM floor
    (huge-Lq shapes fit direct but not 10-state chunked; huge-Lt shapes
    the reverse) — a failed probe only disqualifies that form. Raises
    only when neither form fits."""
    bb_direct = bb_chunk = 0
    if Lt <= _T_CHUNK:
        return Lt  # chunking cannot help (one chunk == direct, more state)
    try:
        bb_direct = _pick_bb(b, Lq, Lt, itemsize)
    except ValueError:
        pass
    try:
        bb_chunk = _pick_bb(b, Lq, _T_CHUNK, itemsize, chunked=True)
    except ValueError:
        pass
    if bb_direct == 0 and bb_chunk == 0:
        raise ValueError(
            f"SW pallas shape Lq={Lq}, Lt={Lt} exceeds the "
            f"{_VMEM_BUDGET >> 20} MiB VMEM budget at the minimum block in "
            f"both the direct and the target-chunked form; use the XLA "
            f"scan path (ops.sw.sw_score) — see pallas_shape_ok."
        )
    return Lt if bb_direct >= bb_chunk else _T_CHUNK


def _roll_lanes(x: jax.Array, shift: int) -> jax.Array:
    """Lane (last-dim) rotate for int32 AND int16. For i16, bitcast to
    i32 first: pltpu.bitcast packs pairs of BATCH rows per i32 lane, so
    lanes stay unpacked and the i32 roll moves both rows identically."""
    if x.dtype == jnp.int16:
        return pltpu.bitcast(pltpu.roll(pltpu.bitcast(x, jnp.int32), shift, 1), jnp.int16)
    return pltpu.roll(x, shift, 1)


def _shift_right(x: jax.Array, is0: jax.Array, fill) -> jax.Array:
    """new[:, i] = old[:, i-1]; new[:, 0] = fill (is0 = lane-0 mask)."""
    return jnp.where(is0, fill, _roll_lanes(x, 1))


def _sw_kernel(
    q_ref, t_ref, bh, bd,
    hd1, hd2, ed1, fd1, tj, trot, *chunk_scratch,
    bb: int, Lq: int, Lt: int, params: SWParams, dt, neg: int, no_n: bool,
    n_chunks: int = 1,
):
    # bh/bd are the OUTPUT refs ([BB, Lq], state dtype): per-column best
    # score and its diagonal; the cross-column winner pick runs at the
    # XLA level outside (with int16 state the in-kernel astype(int32) +
    # broadcast-compare chain hits a Mosaic i1-relayout bug, and the
    # [B, Lq] HBM write costs nothing next to the sweep)
    #
    # Target-chunked mode (n_chunks > 1, SURVEY §2b "blockwise/tiled DP"):
    # grid axis 1 walks Lt-wide target chunks left to right; Lt here is
    # the PER-CHUNK width. Boundary scratch hb/eb carries the previous
    # chunk's last DP column (H[i, -1], E[i, -1] per query row i) across
    # grid steps. Reads and writes of the boundary never collide: the j==0
    # injection reads lane i at step d == i, the last-column export writes
    # lane i at step d == i + Lt - 1, strictly later for every lane.
    chunked = n_chunks > 1
    go = params.gap_open + params.gap_extend
    ge = params.gap_extend
    tpad = 7 if no_n else 4
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, Lq), 1)
    # masks must carry the STATE dtype's tiling: an i1 mask built from a
    # 32-bit compare cannot be relayouted onto 16-bit-packed values by
    # this Mosaic (Invalid relayout vector<...xi1>), so build the loop
    # masks from a dt-typed iota
    col_m = col.astype(dt) if dt != jnp.int32 else col
    is0 = col_m == 0

    qv = q_ref[:]
    q_bad = None if no_n else (qv >= 4)
    zero = jnp.zeros((bb, Lq), dt)
    hd1[:] = zero
    hd2[:] = zero
    ed1[:] = jnp.full((bb, Lq), neg, dt)
    fd1[:] = jnp.full((bb, Lq), neg, dt)
    if chunked:
        hb, eb = chunk_scratch
        c = pl.program_id(1)
        d_base = c * Lt  # global diagonal = local d + c*Lt (j_global = c*Lt + j)

        @pl.when(c == 0)
        def _first_chunk_init():
            # H[:, -1] = 0 reproduces the local-alignment left boundary
            # (h_diag 0 after the shift below); E[:, -1] = neg. The
            # resulting E[i, 0] = -go instead of the unchunked neg is
            # unobservable: -go < 0 loses to the 0-floor at j == 0, and
            # its propagation max(H[i,0]-go, (-go)-ge) == max(H[i,0]-go,
            # neg-ge) since H >= 0 (proof mirrors the bounds note).
            bh[:] = zero
            bd[:] = zero
            hb[:] = zero
            eb[:] = jnp.full((bb, Lq), neg, dt)

        # in-place transform of the carried raw boundary columns into the
        # two vectors the j==0 injection needs: eb <- max(H-go, E-ge)
        # (the E recurrence's boundary term), hb <- H shifted down one
        # row with fill 0 (the diagonal term H[i-1, -1]; H[-1, -1] = 0).
        # The loop's exports overwrite lane i only at step i + Lt - 1,
        # after its last read at step i, so in-place is safe.
        eb[:] = jnp.maximum(hb[:] - go, eb[:] - ge)
        hb[:] = _shift_right(hb[:], is0, 0)
    else:
        bh[:] = zero
        bd[:] = zero
    # diagonal 0 target stream: t[0-i] -> only i=0 is a real base
    tj[:] = jnp.where(is0, t_ref[:, 0:1], tpad)
    # rotating target: at unroll-iteration ``it``, column u+1 holds the
    # stream fill t[:, it*U + u + 1] (wrapped values where out of range —
    # the guard phase masks them, and the pad phase never reads trot).
    # One big rotate per U steps (amortized ~Lt/U vreg-rolls per step
    # instead of Lt — the per-step whole-target roll was 35% of kernel
    # time).
    trot[:] = t_ref[:]

    U = 8  # unrolled steps per loop iteration (even: ping-pong pairs)

    def make_u_steps(mask_j0: bool, fill_mode: str, do_export: bool = False):
        """One unrolled loop body specialised to its diagonal range:
        mask_j0 only while some step can touch column j==0 (d < Lq);
        fill_mode 'real' while every fill index is in range (d+1 < Lt),
        'guard' across the boundary block, 'pad' once the stream is all
        pad (d >= Lt-1, rotating target dead); do_export (chunked only)
        once some step can reach the chunk's last column (d >= Lt-1) —
        the same range where out-of-chunk cells (j >= Lt) appear and
        must be fenced out of the best update. State stays in scratch
        refs per step: hand-carrying it in loop locals was measured
        SLOWER (Mosaic forwards the stores; the locals blow the 16M
        scoped-VMEM stack at BB=512 and the fallback BB=256 loses ~5%)."""

        def one_step(d, u, h_prev, h_prev2, h_out):
            tj_cur = tj[:]
            if no_n:
                sub = jnp.where(
                    qv == tj_cur, params.match, -params.mismatch
                ).astype(dt)
            else:
                sub = jnp.where(
                    q_bad | (tj_cur >= 4),
                    neg,
                    jnp.where(qv == tj_cur, params.match, -params.mismatch),
                ).astype(dt)
            h1 = h_prev[:]
            hg = h1 - go
            e_new = jnp.maximum(hg, ed1[:] - ge)
            h_diag = _shift_right(h_prev2[:], is0, 0)
            if mask_j0:
                isj0 = col_m == jnp.asarray(d, jnp.int32).astype(dt)
                if chunked:
                    # chunk-local column 0 continues from the carried
                    # boundary instead of the local-alignment constants
                    e_new = jnp.where(isj0, eb[:], e_new)
                    h_diag = jnp.where(isj0, hb[:], h_diag)
                else:
                    e_new = jnp.where(isj0, neg, e_new)
                    h_diag = jnp.where(isj0, 0, h_diag)
            # shift(max(a,b)) == max(shift(a), shift(b)) with one roll
            f_new = _shift_right(jnp.maximum(hg, fd1[:] - ge), is0, neg)
            h_new = jnp.maximum(
                jnp.maximum(h_diag + sub, 0), jnp.maximum(e_new, f_new)
            )
            # strictly-greater update keeps the earliest diagonal per column
            upd = h_new > bh[:]
            if do_export:
                # fence out j >= Lt cells: their pad-fed H is <= the true
                # value the NEXT chunk computes, but an equal-H offer here
                # would steal the oracle's earliest-(d, i) tie-break
                # (lane i holds column j = d - i; in-chunk means i > d-Lt)
                upd = upd & (col_m > jnp.asarray(d - Lt, jnp.int32).astype(dt))
            bh[:] = jnp.where(upd, h_new, bh[:])
            d_st = (d + d_base) if chunked else d
            bd[:] = jnp.where(upd, jnp.asarray(d_st, jnp.int32).astype(dt), bd[:])
            if do_export:
                # capture this chunk's last column as it is produced:
                # lane i reaches j == Lt-1 exactly at step d == i + Lt - 1
                isjL = col_m == jnp.asarray(d - (Lt - 1), jnp.int32).astype(dt)
                hb[:] = jnp.where(isjL, h_new, hb[:])
                eb[:] = jnp.where(isjL, e_new, eb[:])
            h_out[:] = h_new
            ed1[:] = e_new
            fd1[:] = f_new
            # advance the target stream: tj_{d+1}[i] = tj_d[i-1], new = t[d+1]
            # (static lane slice u of the rotated block — no dynamic indexing)
            if fill_mode == "real":
                fill = trot[:, u + 1 : u + 2]
            elif fill_mode == "guard":
                fill = jnp.where(d + 1 < Lt, trot[:, u + 1 : u + 2], tpad)
            else:  # "pad": d+1 >= Lt for every step of this phase
                fill = tpad
            tj[:] = _shift_right(tj_cur, is0, fill)

        def u_steps(it, _):
            base = it * U
            for u in range(U):  # static unroll
                if u % 2 == 0:
                    one_step(base + u, u, hd1, hd2, hd2)
                else:
                    one_step(base + u, u, hd2, hd1, hd1)
            if fill_mode != "pad":
                trot[:] = _roll_lanes(trot[:], Lt - U)  # rotate left by U
            return 0

        return u_steps

    # trailing phantom steps (d >= Lq+Lt-1) are harmless: their target
    # stream is all-pad, so every H they produce is gap-chain-bounded
    # strictly below an earlier in-bounds cell and never passes the >
    # update (the padded iteration count covers them).
    n_it = (Lq + Lt - 1 + U - 1) // U
    mask_it = min(n_it, (Lq - 1) // U + 1)          # last it touching d < Lq
    real_it = min(n_it, max(0, (Lt - 1 - U) // U + 1))  # all fills in range
    pad_it = min(n_it, (Lt - 2 + U) // U)           # first it with d >= Lt-1
    exp_it = min(n_it, (Lt - 1) // U)               # first it touching d >= Lt-1
    bps = {0, mask_it, real_it, pad_it, n_it}
    if chunked:
        bps.add(exp_it)
    bps = sorted(bps)
    for a, b in zip(bps, bps[1:]):
        if b <= a or a >= n_it:
            continue
        fill_mode = "real" if b <= real_it else ("pad" if a >= pad_it else "guard")
        jax.lax.fori_loop(
            a, min(b, n_it),
            make_u_steps(a < mask_it, fill_mode, chunked and a >= exp_it),
            0,
        )

    del col


@functools.partial(
    jax.jit, static_argnames=("params", "interpret", "no_n", "target_chunk")
)
def sw_score_pallas(
    q: jax.Array,
    t: jax.Array,
    params: SWParams = SWParams(),
    interpret: bool = False,
    no_n: bool = False,
    target_chunk: int | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for ops.sw.sw_score backed by the Pallas
    kernel. B is padded to a multiple of the block size internally; Lq
    should be a multiple of 128 for lane alignment (pad via pad_tier).

    no_n: caller asserts neither input has a mid-sequence N (code 4
    inside the real sequence; trailing pad 4s are fine) — enables the
    cheap substitution path (see module docstring). Results remain
    bit-exact with ops.sw under that precondition.

    target_chunk: per-chunk target width for the blockwise long-DP path
    (None = auto: direct launch when it fits VMEM at a competitive block
    size, else ``_T_CHUNK``-wide chunks with carried boundary columns —
    arbitrarily long targets in fixed VMEM blocks). Exposed mainly so
    tests can force multi-chunk sweeps on small shapes; must be a
    multiple of 128.
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    max_score = params.match * min(Lq, Lt)
    if max_score < I16_SCORE_LIMIT:
        dt, neg = jnp.int16, NEG16
    elif max_score < (1 << 28):
        dt, neg = jnp.int32, NEG32
    else:
        raise ValueError("score range exceeds int32")
    # the pad-never-wins argument needs strictly-decreasing pad paths
    no_n = bool(no_n) and params.mismatch > 0 and params.gap_extend > 0
    itemsize = jnp.dtype(dt).itemsize

    # chunk decision: direct when it fits at a block size no smaller than
    # the chunked path would get (chunking costs ~(C-1)*Lq extra steps +
    # 3 tail-phase ops; a starved block size costs more)
    if target_chunk is None:
        Tc = _choose_chunk(B, Lq, Lt, itemsize)
    else:
        if target_chunk % 128:
            raise ValueError("target_chunk must be a multiple of 128")
        Tc = min(target_chunk, Lt)
    C = (Lt + Tc - 1) // Tc
    Lt_pad = C * Tc
    if Lt_pad != Lt:
        t = jnp.pad(t, ((0, 0), (0, Lt_pad - Lt)), constant_values=4)
    # the lex-combined (GLOBAL diagonal, lane) pick must fit int32; the
    # int16 state path (disabled, see I16_SCORE_LIMIT) would also need
    # the global diagonal to fit int16 — assert rather than trust
    lqp = 1 << (Lq - 1).bit_length()
    if (Lq + Lt_pad) * lqp >= 2 ** 30:
        raise ValueError("Lq*Lt too large for int32 position packing")
    if C > 1 and dt != jnp.int32:
        raise ValueError("chunked path requires int32 state (global diagonal)")

    BB = _pick_bb(B, Lq, Tc, itemsize, chunked=C > 1)
    Bp = ((B + BB - 1) // BB) * BB
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0)), constant_values=4)
        t = jnp.pad(t, ((0, Bp - B), (0, 0)), constant_values=4)
    if no_n:
        # distinct never-matching pad codes (q-pad never equals t-pad)
        q = jnp.where(q >= 4, jnp.int8(6), q)
        t = jnp.where(t >= 4, jnp.int8(7), t)

    kernel = functools.partial(
        _sw_kernel, bb=BB, Lq=Lq, Lt=Tc, params=params, dt=dt, neg=neg,
        no_n=no_n, n_chunks=C,
    )
    scratch = [
        pltpu.VMEM((BB, Lq), dt),  # hd1
        pltpu.VMEM((BB, Lq), dt),  # hd2
        pltpu.VMEM((BB, Lq), dt),  # ed1
        pltpu.VMEM((BB, Lq), dt),  # fd1
        pltpu.VMEM((BB, Lq), dt),  # tj (target stream)
        pltpu.VMEM((BB, Tc), dt),  # trot (rotating target)
    ]
    if C == 1:
        grid = (Bp // BB,)
        in_specs = [
            pl.BlockSpec((BB, Lq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Tc), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((BB, Lq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Lq), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    else:
        # chunk axis innermost: boundary scratch carries left-to-right
        # within one batch block; bh/bd blocks are revisited (same index)
        # across chunks so they accumulate in VMEM and flush once per
        # batch block — the standard Pallas reduction pattern
        grid = (Bp // BB, C)
        scratch += [
            pltpu.VMEM((BB, Lq), dt),  # hb (carried H boundary column)
            pltpu.VMEM((BB, Lq), dt),  # eb (carried E boundary column)
        ]
        in_specs = [
            pl.BlockSpec((BB, Lq), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Tc), lambda i, c: (i, c), memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((BB, Lq), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Lq), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        ]
    bh_out, bd_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Lq), dt),  # bh: best score per column
            jax.ShapeDtypeStruct((Bp, Lq), dt),  # bd: its GLOBAL diagonal
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=10 * Bp * Lq * (Lq + Lt_pad),
            bytes_accessed=Bp * (Lq + Lt_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q.astype(dt), t.astype(dt))
    # cross-column winner (XLA): among max-score columns minimize
    # (diagonal, lane) lexicographically — identical to argmax-first over
    # the wavefront (same math the kernel used to do in-core)
    bh32 = bh_out[:B].astype(jnp.int32)
    bd32 = bd_out[:B].astype(jnp.int32)
    row_max = jnp.max(bh32, axis=1)
    colv = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    combined = jnp.where(bh32 == row_max[:, None], bd32 * lqp + colv, jnp.int32(2 ** 30))
    m = jnp.min(combined, axis=1)
    i_star = m & (lqp - 1)
    d_star = m >> (lqp - 1).bit_length()
    j_star = d_star - i_star
    none = row_max <= 0
    return (
        jnp.where(none, 0, row_max),
        jnp.where(none, -1, i_star),
        jnp.where(none, -1, j_star),
    )
