#!/usr/bin/env python
"""Hardware proof of the wavefront SW kernel's roll-bound ceiling.

The v5 kernel does 3 mandatory lane rolls per anti-diagonal step (target
stream, F shift, H-diagonal shift — the information-theoretic minimum for
any skew of the wavefront; see ops/sw_pallas.py and ROADMAP). This probe
times three stripped kernels at the exact bench.py shape
(512 x (256 x 512), int32):

  rolls3   — ONLY the three per-step rolls + one max (keeps stores live)
  rolls0   — the same loop with the rolls replaced by elementwise maxes
             (same op count, no lane movement)
  full     — the production sw_score_pallas kernel

GCUPS-equivalents use the same cells = B*Lq*Lt accounting as bench.py.
If rolls3 lands near full, the kernel is roll-bound and its measured
number IS the ceiling for this factorization; rolls0 shows what the
non-roll work alone would cost. Timing is fetch-forced slope-fit like
bench.py (block_until_ready does not wait under the TPU relay).

Run on the real chip: python tools/sw_ceiling_probe.py
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B, LQ, LT = 512, 256, 512
BB = 512
U = 8


def _loop_kernel(q_ref, t_ref, o_ref, hd1, hd2, fd1, tj, *, do_rolls: bool):
    hd1[:] = q_ref[:].astype(jnp.int32)
    hd2[:] = jnp.zeros((BB, LQ), jnp.int32)
    fd1[:] = jnp.zeros((BB, LQ), jnp.int32)
    tj[:] = t_ref[:, :LQ].astype(jnp.int32)
    n_it = (LQ + LT - 1 + U - 1) // U

    def body(it, _):
        for _u in range(U):
            if do_rolls:
                a = pltpu.roll(hd2[:], 1, 1)   # H-diagonal shift
                b = pltpu.roll(fd1[:], 1, 1)   # F shift
                c = pltpu.roll(tj[:], 1, 1)    # target stream shift
            else:
                a = jnp.maximum(hd2[:], 1)
                b = jnp.maximum(fd1[:], 2)
                c = jnp.maximum(tj[:], 3)
            h = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, hd1[:]))
            hd2[:] = hd1[:]
            hd1[:] = h
            fd1[:] = b
            tj[:] = c
        return 0

    jax.lax.fori_loop(0, n_it, body, 0)
    o_ref[:] = hd1[:]


@functools.partial(jax.jit, static_argnames=("do_rolls",))
def stripped(q, t, do_rolls: bool):
    kernel = functools.partial(_loop_kernel, do_rolls=do_rolls)
    return pl.pallas_call(
        kernel,
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, LQ), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, LT), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, LQ), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, LQ), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BB, LQ), jnp.int32)] * 4,
    )(q, t)


def slope_time(fn, *args, iters=60):
    """bench.py's exact methodology: fetch-forced slope fit between two
    run lengths, one throwaway fit to absorb relay warmup drift, then
    the median of three honest fits."""
    def once(n):
        out = fn(*args)
        np.asarray(out)  # warm + sync
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)  # the only true sync under the relay
        return time.perf_counter() - t0

    once(iters)  # throwaway fit absorbs warmup drift
    slopes = []
    for _ in range(3):
        t_short = once(iters)
        t_long = once(iters * 4)
        slopes.append(max((t_long - t_short) / (iters * 3), 1e-9))
    return sorted(slopes)[1]


def main():
    from breakmer_tpu.ops.sw import SWParams
    from breakmer_tpu.ops.sw_pallas import sw_score_pallas

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (B, LQ), dtype=np.int8))
    t = jnp.asarray(rng.integers(0, 4, (B, LT), dtype=np.int8))
    cells = B * LQ * LT

    t3 = slope_time(lambda a, b: stripped(a, b, True), q, t, iters=250)
    t0 = slope_time(lambda a, b: stripped(a, b, False), q, t, iters=250)
    params = SWParams()
    tf = slope_time(
        lambda a, b: sw_score_pallas(a, b, params, no_n=True)[0], q, t
    )
    out = {
        "metric": "sw_ceiling_probe",
        "shape": [B, LQ, LT],
        "rolls3_s": round(t3, 6),
        "rolls0_s": round(t0, 6),
        "full_s": round(tf, 6),
        "rolls3_gcups_equiv": round(cells / t3 / 1e9, 1),
        "rolls0_gcups_equiv": round(cells / t0 / 1e9, 1),
        "full_gcups": round(cells / tf / 1e9, 1),
        "roll_bound_fraction": round(t3 / tf, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
