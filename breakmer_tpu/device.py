"""Device/backend selection with graceful fallback.

The reference has no accelerator at all; this module is the single place
the TPU framework decides where compute lands. Policy (Config.device):

  "auto" (default): use the default JAX backend (TPU when the plugin is
      healthy); if backend initialization fails — e.g. the TPU plugin
      did not register or the chip is held elsewhere — fall back to CPU
      instead of crashing the run.
  "cpu": force CPU (also what tests use, with 8 virtual devices).
  "tpu": require an accelerator; raise if unavailable.

Must be called before the first JAX computation of the process.
"""

from __future__ import annotations

from pathlib import Path

import jax

from breakmer_tpu.utils.logging import get_logger

log = get_logger("device")

_configured: str | None = None

# repo-local so it survives sandbox /tmp cleanup between sessions —
# first TPU compiles cost 20-70 s each through the tunnel (gitignored)
CACHE_DIR = str(Path(__file__).resolve().parent.parent / ".jax_cache")


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: first-compile on the TPU tunnel costs
    20-70s per executable; cached reruns are milliseconds."""
    try:
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is an optimization only
        log.warning("could not enable persistent compilation cache")


def set_platform(device: str = "auto") -> None:
    """Set jax_platforms WITHOUT initializing the XLA backend — safe to
    call before jax.distributed.initialize (which must itself precede any
    backend-initialising call). configure() probes devices afterwards."""
    _enable_compile_cache()
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")


def configure(device: str = "auto") -> str:
    """Select the backend; returns the platform actually in use."""
    global _configured
    if _configured is not None:
        return _configured
    _enable_compile_cache()
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        _configured = "cpu"
        return _configured
    try:
        platform = jax.devices()[0].platform
        _configured = platform
        return platform
    except RuntimeError as exc:
        if device == "tpu":
            raise
        log.warning("accelerator backend unavailable (%s); falling back to CPU", exc)
        jax.config.update("jax_platforms", "cpu")
        _configured = "cpu"
        return _configured


def device_count() -> int:
    return len(jax.devices())


def commit_local(*arrays):
    """Commit host arrays to this process's first local device.

    Under multi-process JAX (jax.distributed initialized), jit treats
    uncommitted numpy args as GLOBAL inputs and refuses them; committing
    to a local device keeps the computation process-local — which is this
    framework's multihost model: regions are partitioned across processes
    and each process runs its own device pipeline (SURVEY.md §2b), only
    the call-set merge crosses processes.
    """
    if jax.process_count() <= 1:
        return arrays if len(arrays) != 1 else arrays[0]
    dev = jax.local_devices()[0]
    out = tuple(jax.device_put(a, dev) for a in arrays)
    return out if len(out) != 1 else out[0]
