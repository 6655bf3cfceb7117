"""Benchmark harness — run on the real TPU chip.

Headline metric (BASELINE.md): Smith-Waterman DP throughput in GCUPS
(giga cell-updates per second) per chip, measured on the batched
anti-diagonal wavefront kernel. Also measures the fused region step
(k-mer subtract + SW) in regions/s and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline: the reference publishes no throughput numbers
(BASELINE.json "published": {}), so the ratio is reported against the
recorded best of THIS framework's first TPU measurement (stored in
bench_baseline.json after the first run) — i.e. it tracks self-improvement
across rounds; 1.0 on the first run.
"""

from __future__ import annotations

import functools
import json
import time
from pathlib import Path

import numpy as np

BASELINE_FILE = Path(__file__).parent / "bench_baseline.json"

# benchmark shape: 512 (contig, window) pairs of 256x512 — a realistic
# panel realignment burst (SURVEY.md §7: contig pad tier 256, window 512)
B, LQ, LT = 512, 256, 512
# the slope fit subtracts per-fetch relay overhead (~30-40 ms, noisy at
# the ~10 ms level); the long-short difference must dwarf that noise, so
# for a ~1 ms kernel the iteration counts need to be in the hundreds
ITERS = 60


def _time_sw(fn, q, t) -> float:
    """Amortized per-batch seconds. IMPORTANT: the axon TPU relay's
    block_until_ready returns before device completion; only a
    device->host fetch forces real completion, so timing brackets a
    fetch and subtracts the per-call overhead via two run lengths."""
    import jax

    def run(iters: int) -> float:
        out = fn(q, t)
        np.asarray(out[0])  # warmup + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(q, t)
        np.asarray(out[0])  # force completion
        return time.perf_counter() - t0

    # the first slope fit of a process absorbs relay warmup drift
    # (measured: 59 vs 79 GCUPS across identical runs), so burn one
    # throwaway fit, then report the MEDIAN of three honest fits
    run(ITERS)
    slopes = []
    for _ in range(3):
        t_short = run(ITERS)
        t_long = run(ITERS * 4)
        slopes.append(max((t_long - t_short) / (ITERS * 3), 1e-9))
    return sorted(slopes)[1]


def bench_sw(device) -> dict:
    import jax
    import jax.numpy as jnp

    from breakmer_tpu.ops.sw import sw_score
    from breakmer_tpu.ops.sw_pallas import sw_score_pallas

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, size=(B, LQ)).astype(np.int8))
    t = jnp.asarray(rng.integers(0, 4, size=(B, LT)).astype(np.int8))
    q = jax.device_put(q, device)
    t = jax.device_put(t, device)

    cells = B * LQ * LT
    dt_xla = _time_sw(sw_score, q, t)
    out = {
        "sw_xla_gcups": cells / dt_xla / 1e9,
        "sw_cells_per_batch": cells,
    }
    try:
        # correctness cross-check on-device (both kernel variants), then
        # timing; the fast path is valid here (inputs have no mid-seq N)
        fast = functools.partial(sw_score_pallas, no_n=True)
        s0, _, _ = sw_score(q, t)
        s1, _, _ = sw_score_pallas(q, t)
        s2, _, _ = fast(q, t)
        if not bool(jnp.all(s0 == s1)) or not bool(jnp.all(s0 == s2)):
            raise RuntimeError("pallas kernel disagrees with XLA scores")
        dt_pl = _time_sw(fast, q, t)
        out["sw_pallas_gcups"] = cells / dt_pl / 1e9
        dt_nm = _time_sw(sw_score_pallas, q, t)
        out["sw_pallas_nmasked_gcups"] = cells / dt_nm / 1e9
    except Exception as exc:  # pragma: no cover
        out["sw_pallas_error"] = f"{type(exc).__name__}: {exc}"
    out["sw_gcups"] = max(out.get("sw_pallas_gcups", 0.0), out["sw_xla_gcups"])
    try:
        # secondary: the target-chunked long-DP path (SURVEY §2b blockwise
        # DP) on a 64x(512x16384) burst — long targets amortize the
        # wavefront fill/drain, so this runs ABOVE the headline tier
        # (~105 GCUPS vs ~82). Not the headline: the committed
        # self-baseline is pinned to the realistic panel tier above.
        Bl, Lql, Ltl = 64, 512, 16384
        ql = jax.device_put(jnp.asarray(
            rng.integers(0, 4, size=(Bl, Lql)).astype(np.int8)), device)
        tl = jax.device_put(jnp.asarray(
            rng.integers(0, 4, size=(Bl, Ltl)).astype(np.int8)), device)
        s0, _, _ = sw_score(ql, tl)
        s1, _, _ = fast(ql, tl)
        if not bool(jnp.all(s0 == s1)):
            raise RuntimeError("chunked kernel disagrees with XLA scores")
        dt_l = _time_sw(fast, ql, tl)
        out["sw_longdp_gcups"] = Bl * Lql * Ltl / dt_l / 1e9
    except Exception as exc:  # pragma: no cover
        out["sw_longdp_error"] = f"{type(exc).__name__}: {exc}"
    return out


def bench_region_step(device) -> dict:
    import jax

    from breakmer_tpu.parallel.step import make_region_step

    G, R, L, LREF = 8, 256, 128, 4096
    GB, GLQ, GLT = 16, 256, 512
    rng = np.random.default_rng(1)
    inputs = (
        rng.integers(0, 4, size=(G, R, L)).astype(np.int8),
        np.full((G, R), L, dtype=np.int32),
        rng.integers(0, 4, size=(G, LREF)).astype(np.int8),
        np.full((G,), LREF, dtype=np.int32),
        rng.integers(0, 4, size=(G, GB, GLQ)).astype(np.int8),
        rng.integers(0, 4, size=(G, GB, GLT)).astype(np.int8),
    )
    inputs = tuple(jax.device_put(x, device) for x in inputs)
    step = make_region_step(mesh=None, k=15)

    def run(iters: int) -> float:
        out = step(*inputs)
        np.asarray(out[2])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*inputs)
        np.asarray(out[2])  # fetch forces completion (axon relay)
        return time.perf_counter() - t0

    t_short = run(ITERS)
    t_long = run(ITERS * 4)
    dt = max((t_long - t_short) / (ITERS * 3), 1e-9)
    return {
        # device microbench of the jitted region step ONLY (no host stages,
        # no IO) — NOT e2e panel throughput; see bench_panel.py for that.
        "device_step_regions_per_s": G / dt,
        "device_step_reads_per_s": G * R / dt,
        "region_step_ms": dt * 1e3,
    }


def main() -> None:
    from breakmer_tpu.device import configure

    platform = configure("auto")
    import jax

    device = jax.devices()[0]

    sw = bench_sw(device)
    step = bench_region_step(device)

    value = round(sw["sw_gcups"], 3)
    if BASELINE_FILE.exists():
        base = json.loads(BASELINE_FILE.read_text())
    else:
        base = {"sw_gcups": value}
        BASELINE_FILE.write_text(json.dumps(base))
    vs = round(value / base["sw_gcups"], 3) if base.get("sw_gcups") else 1.0

    print(
        json.dumps(
            {
                "metric": "sw_wavefront_gcups_per_chip",
                "value": value,
                "unit": "GCUPS",
                "vs_baseline": vs,
                "platform": platform,
                "device": str(device),
                "detail": {**sw, **step},
            }
        )
    )


if __name__ == "__main__":
    main()
