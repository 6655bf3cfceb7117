#!/usr/bin/env python
# Probe: does this Mosaic lower a lane-axis cummax inside a pallas kernel?
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k_cummax(x_ref, o_ref):
    o_ref[:] = jax.lax.cummax(x_ref[:], axis=1)

def k_accum(x_ref, o_ref):
    o_ref[:] = jnp.maximum.accumulate(x_ref[:], axis=1)

x = jnp.asarray(np.random.default_rng(0).integers(0, 100, (8, 256), np.int32))
for name, k in (("lax.cummax", k_cummax), ("max.accumulate", k_accum)):
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ok = np.array_equal(np.asarray(out), np.maximum.accumulate(np.asarray(x), 1))
        print(name, "LOWERS, correct:", ok)
    except Exception as e:
        print(name, "FAILS:", str(e).splitlines()[0][:150])
