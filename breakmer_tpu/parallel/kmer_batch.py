"""Batched multi-region k-mer step (BASELINE.json config #3).

The serial runner pays one device dispatch per region; this step packs G
regions into one fixed-shape launch (parallel/regions.py pack) and runs
the whole panel's k-mer extract/count/subtract in a single jit —
optionally sharded over the device mesh ("regions" axis), which is the
device analog of the reference's multiprocessing pool (SURVEY.md §2b).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np

from breakmer_tpu.parallel.mesh import AXIS_REGIONS
from breakmer_tpu.parallel.regions import RegionBatch
from breakmer_tpu.parallel.step import _per_region_kmers

_SENTINEL = np.uint32(0xFFFFFFFF)


@functools.lru_cache(maxsize=32)
def _compiled_kmer_step(k: int, min_count: int, mesh_id: Optional[int]) -> Callable:
    body = jax.vmap(functools.partial(_per_region_kmers, k=k, min_count=min_count))
    mesh = _MESHES.get(mesh_id) if mesh_id is not None else None
    if mesh is None:
        return jax.jit(body)
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(AXIS_REGIONS)
    sharded = shard_map(
        lambda *a: tuple(
            jax.lax.all_gather(o, AXIS_REGIONS, axis=0, tiled=True)
            for o in body(*a)
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(
        sharded,
        in_shardings=tuple(NamedSharding(mesh, spec) for _ in range(4)),
    )


_MESHES: Dict[int, jax.sharding.Mesh] = {}


def _postprocess(batch: RegionBatch, values: np.ndarray, counts: np.ndarray):
    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for g, name in enumerate(batch.names):
        if not name:
            continue
        v = values[g]
        c = counts[g]
        keep = (v != _SENTINEL) & (c > 0)
        v, c = v[keep], c[keep]
        order = np.lexsort((v, -c.astype(np.int64)))
        out[name] = (v[order], c[order])
    return out


def run_kmer_batch(
    batch: RegionBatch,
    k: int,
    min_count: int = 2,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """One device launch for G regions; returns per-region sample-only
    k-mers as {region_name: (values desc-by-count, counts)} — the same
    host-side contract as ops.kmer.sample_only_kmers, ready for the
    assembler.

    Note: the in-device reference subtraction covers both strands; normal
    -sample subtraction is not batched (regions with a matched normal use
    the serial path)."""
    return run_kmer_batches([batch], k, min_count, mesh)


def run_kmer_batches(
    batches,
    k: int,
    min_count: int = 2,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Pipelined multi-batch form: dispatch EVERY tier's launch before
    fetching anything (JAX dispatch is async), then one device_get for
    all outputs. Per-fetch TPU-relay round-trips (~30 ms each) dominated
    the panel's k-mer stage when each batch synced before the next
    dispatched."""
    from breakmer_tpu.utils.meter import METER

    with METER.stage("kmer_device"):
        return _run_kmer_batches(batches, k, min_count, mesh)


def _run_kmer_batches(batches, k, min_count, mesh):
    mesh_id = None
    if mesh is not None:
        mesh_id = id(mesh)
        _MESHES[mesh_id] = mesh
    step = _compiled_kmer_step(k, min_count, mesh_id)
    batches = list(batches)
    if mesh is not None:
        # explicit placement: under multi-process JAX, raw numpy args to a
        # jit are rejected; a NamedSharding over this process's (local)
        # mesh is fully addressable and matches the step's in_shardings
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = NamedSharding(mesh, P(AXIS_REGIONS))

        def place(b):
            return tuple(
                jax.device_put(x, spec)
                for x in (b.reads, b.lengths, b.refs, b.ref_lengths)
            )
    else:
        from breakmer_tpu.device import commit_local

        def place(b):
            out = commit_local(b.reads, b.lengths, b.refs, b.ref_lengths)
            return out

    pending = [step(*place(b)) for b in batches]
    fetched = jax.device_get(pending)
    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for b, (values, counts) in zip(batches, fetched):
        out.update(_postprocess(b, np.asarray(values), np.asarray(counts)))
    return out
