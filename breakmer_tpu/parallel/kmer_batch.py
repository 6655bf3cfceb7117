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
def _compiled_kmer_step(k: int, min_count: int, mesh_id: Optional[int],
                        with_normal: bool = False) -> Callable:
    body = jax.vmap(functools.partial(_per_region_kmers, k=k, min_count=min_count))
    n_in = 6 if with_normal else 4
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
        in_specs=(spec,) * n_in,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(
        sharded,
        in_shardings=tuple(NamedSharding(mesh, spec) for _ in range(n_in)),
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


class KmerBatchPipeline:
    """Incremental batched k-mer stage: regions are added as host
    extraction finishes them; whenever a pad-tier group fills, its packed
    batch is DISPATCHED immediately (JAX dispatch is async), so device
    k-mer compute overlaps the host's extraction of later regions — and
    ``results()`` yields per-batch outputs as their fetches complete, so
    host assembly of early batches overlaps device compute of late ones
    (VERDICT r1 #4: host/device pipeline overlap). Region-level results
    are identical to run_kmer_batches (same pack, same step, same
    postprocess) — only the launch schedule changes."""

    def __init__(self, k: int, min_count: int = 2,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 regions_per_batch: int = 8):
        from breakmer_tpu.parallel.regions import tier_key

        self.k = k
        self.min_count = min_count
        self.mesh = mesh
        self.rpb = regions_per_batch
        self._tier_key = tier_key
        self._buffers: Dict[tuple, list] = {}
        self._pending: list = []
        self._mesh_id = None
        if mesh is not None:
            self._mesh_id = id(mesh)
            _MESHES[self._mesh_id] = mesh

    def add(self, name: str, batch, ref, normal=None) -> None:
        key = self._tier_key(batch, ref, normal, normal is not None)
        buf = self._buffers.setdefault(key, [])
        buf.append((name, batch, ref, normal))
        if len(buf) >= self.rpb:
            self._dispatch(list(buf))
            buf.clear()

    def _dispatch(self, members) -> None:
        from breakmer_tpu.parallel.regions import pack_region_batches
        from breakmer_tpu.utils.meter import METER

        with METER.stage("kmer_device"):
            (b,) = pack_region_batches(members, self.rpb)
            step = _compiled_kmer_step(
                self.k, self.min_count, self._mesh_id,
                with_normal=b.normal_reads is not None,
            )
            args = (b.reads, b.lengths, b.refs, b.ref_lengths)
            if b.normal_reads is not None:
                args += (b.normal_reads, b.normal_lengths)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                spec = NamedSharding(self.mesh, P(AXIS_REGIONS))
                args = tuple(jax.device_put(x, spec) for x in args)
            else:
                from breakmer_tpu.device import commit_local

                args = commit_local(*args)
            self._pending.append((b, step(*args)))

    def results(self):
        """Flush partial groups, then yield {region: (values, counts)}
        per batch. ONE device_get for every pending output — per-batch
        fetches cost a ~30 ms relay round-trip EACH (measured: 13 separate
        fetches tripled the stage), while the dispatches already
        overlapped extraction."""
        from breakmer_tpu.utils.meter import METER

        for buf in self._buffers.values():
            if buf:
                self._dispatch(list(buf))
                buf.clear()
        with METER.stage("kmer_device"):
            fetched = jax.device_get([out for _, out in self._pending])
        for (b, _), (values, counts) in zip(self._pending, fetched):
            yield _postprocess(b, np.asarray(values), np.asarray(counts))
        self._pending = []

    def finish(self) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        merged: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        for d in self.results():
            merged.update(d)
        return merged


def run_kmer_batch(
    batch: RegionBatch,
    k: int,
    min_count: int = 2,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """One device launch for G regions; returns per-region sample-only
    k-mers as {region_name: (values desc-by-count, counts)} — the same
    host-side contract as ops.kmer.sample_only_kmers, ready for the
    assembler. The in-device reference subtraction covers both strands;
    batches built with a matched normal (RegionBatch.normal_reads) add
    the in-device normal subtraction too (r2 — the r1 path fell back to
    serial whenever a normal BAM was configured)."""
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
    batches = list(batches)

    def args_of(b):
        base = (b.reads, b.lengths, b.refs, b.ref_lengths)
        if b.normal_reads is not None:
            base += (b.normal_reads, b.normal_lengths)
        return base

    if mesh is not None:
        # explicit placement: under multi-process JAX, raw numpy args to a
        # jit are rejected; a NamedSharding over this process's (local)
        # mesh is fully addressable and matches the step's in_shardings
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = NamedSharding(mesh, P(AXIS_REGIONS))

        def place(b):
            return tuple(jax.device_put(x, spec) for x in args_of(b))
    else:
        from breakmer_tpu.device import commit_local

        def place(b):
            return commit_local(*args_of(b))

    pending = [
        _compiled_kmer_step(
            k, min_count, mesh_id, with_normal=b.normal_reads is not None
        )(*place(b))
        for b in batches
    ]
    fetched = jax.device_get(pending)
    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for b, (values, counts) in zip(batches, fetched):
        out.update(_postprocess(b, np.asarray(values), np.asarray(counts)))
    return out
