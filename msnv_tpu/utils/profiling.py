"""Profiling hooks — the reference has none (SURVEY.md §5.1: wall-clock
only); here: jax.profiler traces + a simple step timer for roofline checks.
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard or xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step statistics with warmup discard."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._n = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self):
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {"mean_s": float(a.mean()), "p50_s": float(np.median(a)),
                "p95_s": float(np.percentile(a, 95)), "n": len(a)}


def roofline(flops: float, bytes_moved: float, wall_s: float,
             peak_flops: float = 394e12, peak_bw: float = 819e9):
    """Roofline utilization numbers for one kernel/step on TPU v5e
    (defaults: bf16 peak 394 TFLOP/s, HBM 819 GB/s)."""
    return {
        "achieved_tflops": flops / wall_s / 1e12,
        "flops_util": flops / wall_s / peak_flops,
        "achieved_gbps": bytes_moved / wall_s / 1e9,
        "bw_util": bytes_moved / wall_s / peak_bw,
        "arithmetic_intensity": flops / max(bytes_moved, 1.0),
    }


def enable_compile_cache(repo_root: str | None = None) -> None:
    """Point jax at the repo-local persistent compile cache (.jax_cache) —
    the big generation graphs cold-compile in minutes but reload in ~1 s.
    Safe on jax versions without the config keys (no-op)."""
    import jax
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo_root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


_CHIP_LOCK_HANDLE = None


def acquire_chip_lock(path: str = "/tmp/msnv_chip.lock") -> None:
    """Serialize chip-using study/benchmark processes on this host.

    The tunneled device does not timeshare between processes: a second
    process attaching mid-run can wedge the first one's in-flight call
    permanently (observed round 5 — a concurrent fine-tune froze a
    training run mid-step until both were killed). Every long-running
    chip entry point (real_speech_run, voice_conversion_run,
    transfer_learning_run) calls this before touching the device; the
    exclusive flock blocks until the current owner exits and is released
    automatically by process exit. No-op on non-Linux (no fcntl)."""
    global _CHIP_LOCK_HANDLE
    if _CHIP_LOCK_HANDLE is not None:
        return
    try:
        import fcntl
    except ImportError:
        return
    handle = open(path, "w")
    try:
        fcntl.flock(handle, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except BlockingIOError:
        print(f"waiting for the chip lock ({path}): another chip job "
              f"owns the device...", flush=True)
        fcntl.flock(handle, fcntl.LOCK_EX)
    _CHIP_LOCK_HANDLE = handle
    print("chip lock acquired", flush=True)
