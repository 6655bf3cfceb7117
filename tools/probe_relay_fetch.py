"""Probe the axon TPU relay's device->host fetch economics.

Measured 2026-08-20 (drives the packed kmer fetch design in
parallel/kmer_batch.py):

- base device_get round trip: ~35-45 ms, roughly independent of buffer
  COUNT when fetched in one device_get (2 vs 4 small buffers alike);
- separate np.asarray calls pay the round trip EACH (~35 ms/buffer);
- large buffers are BANDWIDTH-bound at ~25-30 MB/s (2 MB buffers:
  2-buf ~150 ms, 4-buf ~250 ms) — so fetched BYTES matter more than
  buffer count once payloads exceed ~100 KB.

Conclusions: (1) always one device_get for all pending outputs;
(2) compact padded outputs on device before fetching (kmer_batch
_compact_outputs); (3) don't stack small outputs into one buffer via an
extra jit — the extra dispatch costs more than the saved buffers.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def probe(name, fn, reps=6):
    fn()  # warm / compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:28s} median {med * 1000:7.1f} ms   "
          f"{[f'{t*1000:.0f}' for t in ts]}")
    return med


def main():
    f1 = jax.jit(lambda x: (x + 1, x * 2))
    f2 = jax.jit(lambda x: (x + 3, x * 5))
    f3 = jax.jit(lambda x: (x + 1, x * 2, x - 3))
    small = jnp.ones((32, 1024), jnp.uint32)    # 128 KB/buffer
    big = jnp.ones((32, 16384), jnp.uint32)     # 2 MB/buffer
    probe("1get_2buf_small", lambda: jax.device_get(f1(small)))
    probe("1get_4buf_small_2jits", lambda: jax.device_get([f1(small), f2(small)]))
    probe("3buf_asarray_each", lambda: [np.asarray(o) for o in f3(small)])
    t2 = probe("1get_2buf_big", lambda: jax.device_get(f1(big)))
    t4 = probe("1get_4buf_big_2jits", lambda: jax.device_get([f1(big), f2(big)]))
    base = probe("1get_2buf_small(base)", lambda: jax.device_get(f1(small)))
    mb = 32 * 16384 * 4 / 1e6
    if t4 > t2 > base:
        bw = (4 * mb - 2 * mb) / (t4 - t2)
        print(f"approx fetch bandwidth: {bw:.1f} MB/s "
              f"(from the 2MB-buffer delta)")


if __name__ == "__main__":
    main()
