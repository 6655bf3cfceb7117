"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax

AXIS_REGIONS = "regions"
AXIS_PAIRS = "pairs"


def mesh_axes() -> Tuple[str, str]:
    return (AXIS_REGIONS, AXIS_PAIRS)


def _factor_2d(n: int) -> Tuple[int, int]:
    """Largest factor pair (a, b) with a*b == n and a >= b, a the regions
    axis (regions parallelism is the dominant dimension, like the
    reference's process pool)."""
    best = (n, 1)
    f = 1
    while f * f <= n:
        if n % f == 0:
            best = (n // f, f)
        f += 1
    return best


def make_mesh_2d(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> jax.sharding.Mesh:
    """Mesh over (regions, pairs). n_devices defaults to all local."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    a, b = _factor_2d(len(devices))
    import numpy as np

    dev_array = np.array(devices).reshape(a, b)
    return jax.sharding.Mesh(dev_array, (AXIS_REGIONS, AXIS_PAIRS))
