#!/usr/bin/env python
"""Probe round 2: can i16 max be EMULATED from the ops that do lower?

Round 1 (probe_swar_i16.py): i16 add/bitwise/astype/roll-bitcast lower;
max/min/mul/compares fail; 'sub const' SIGABRTed (constant splat?).

max(a,b) = a - (d & (d >> 15)) with d = a - b needs: tensor sub,
arithmetic shift right, and. This file probes each, plus constant
splat variants, then the emulated max and a fused mini-recurrence.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (16, 256)
rng = np.random.default_rng(0)
A = rng.integers(-1000, 1000, SHAPE).astype(np.int16)
B = rng.integers(-1000, 1000, SHAPE).astype(np.int16)


def run(name, kernel, inputs, expect):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, expect.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*[jnp.asarray(x) for x in inputs])
        ok = np.array_equal(np.asarray(out), expect)
        print(f"{name:34s} LOWERS  bit-exact={ok}")
        return ok
    except Exception as e:
        print(f"{name:34s} FAILS   {str(e).splitlines()[0][:120]}")
        return False


run("i16 sub tensor", lambda a, b, o: o.__setitem__(slice(None), a[:] - b[:]),
    [A, B], (A - B).astype(np.int16))
run("i16 ashr 15", lambda a, o: o.__setitem__(slice(None), a[:] >> 15),
    [A], (A >> 15).astype(np.int16))
run("i16 shl 1", lambda a, o: o.__setitem__(slice(None), a[:] << 1),
    [A], (A << 1).astype(np.int16))
run("i16 add splat-int16", lambda a, o: o.__setitem__(slice(None), a[:] + jnp.int16(6)),
    [A], (A + 6).astype(np.int16))
run("i16 add py-int", lambda a, o: o.__setitem__(slice(None), a[:] + 6),
    [A], (A + 6).astype(np.int16))
run("i16 add full-array const",
    lambda a, o: o.__setitem__(slice(None), a[:] + jnp.full(SHAPE, 6, jnp.int16)),
    [A], (A + 6).astype(np.int16))


def emulated_max(a, b):
    d = a - b
    return a - (d & (d >> 15))


run("i16 emulated max",
    lambda a, b, o: o.__setitem__(slice(None), emulated_max(a[:], b[:])),
    [A, B], np.maximum(A, B))


# fused mini-recurrence with emulated max (state values stay in i16 range)
def k_mini(q32, t32, o):
    go = jnp.full(SHAPE, 6, jnp.int16)
    ge = jnp.full(SHAPE, 1, jnp.int16)
    zero = jnp.zeros(SHAPE, jnp.int16)
    sub = jnp.where(q32[:] == t32[:], 2, -3).astype(jnp.int16)  # i32 cmp
    h = emulated_max(sub, zero)
    e = h - go
    for _ in range(3):
        hr = pltpu.bitcast(pltpu.roll(pltpu.bitcast(h, jnp.int32), 1, 1), jnp.int16)
        e = emulated_max(h - go, e - ge)
        h = emulated_max(emulated_max(hr + sub, zero), e)
    o[:] = h


Q32 = rng.integers(0, 4, SHAPE).astype(np.int32)
T32 = rng.integers(0, 4, SHAPE).astype(np.int32)


def mini_ref(q, t):
    sub = np.where(q == t, 2, -3).astype(np.int16)
    h = np.maximum(sub, 0).astype(np.int16)
    e = (h - 6).astype(np.int16)
    for _ in range(3):
        hr = np.roll(h, 1, 1)
        e = np.maximum(h - 6, e - 1).astype(np.int16)
        h = np.maximum(np.maximum(hr + sub, 0), e).astype(np.int16)
    return h


run("fused mini (emulated max)", k_mini, [Q32, T32], mini_ref(Q32, T32))

# strict-greater bd update with emulated ops only:
# upd = h > bh: d = bh - h; mask = (d >> 15) (all-ones iff bh < h)
# bh' = select(mask, h, bh); bd' = select(mask, D, bd)
H = rng.integers(0, 120, SHAPE).astype(np.int16)
BH = rng.integers(0, 120, SHAPE).astype(np.int16)
BD = rng.integers(0, 50, SHAPE).astype(np.int16)


def k_upd(h, bh, bd, o):
    d = bh[:] - h[:]
    m = d >> 15
    o[:] = (bd[:] & ~m) | (jnp.full(SHAPE, 77, jnp.int16) & m)


run("emulated strict-greater select", k_upd, [H, BH, BD],
    np.where(H > BH, np.int16(77), BD).astype(np.int16))
