#!/usr/bin/env python
"""Decompose the B=1 interactive push cost on the real chip.

Measures, for the flagship config:
  - raw dispatch floor: an empty jitted fn + a 1-float device->host fetch
  - streaming push (XLA inner scan)   at (B,K) in {(1,1),(1,4)}
  - streaming push (pallas v3 window) at the same points
  - streaming push with unrolled inner scan
Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from msnv_tpu.utils.profiling import enable_compile_cache
enable_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msnv_tpu.config import preset
from msnv_tpu.models.generate import streaming_fn
from msnv_tpu.models.samplernn import init_params


def time_push(push, carry, cond, n=30):
    carry2, a, _ = push(carry, cond)
    float(a[-1, -1])
    t0 = time.perf_counter()
    c = carry
    for _ in range(n):
        c, a, _ = push(c, cond)
    float(a[-1, -1])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = preset("samplernn")
    m = cfg.model
    params = init_params(jax.random.PRNGKey(0), m)
    rng = np.random.RandomState(0)
    res = {}

    # dispatch floor
    @jax.jit
    def nop(x):
        return x + 1.0
    x = jnp.zeros(())
    x = nop(x); float(x)
    t0 = time.perf_counter()
    for _ in range(30):
        x = nop(x)
    float(x)
    res["dispatch_floor_ms"] = round((time.perf_counter() - t0) / 30 * 1e3, 3)

    for B, K in ((1, 1), (1, 4)):
        cond = jnp.asarray(
            rng.rand(B, K, m.effective_cond_dim).squeeze(1) if K == 1
            else rng.rand(B, K, m.effective_cond_dim), jnp.float32)
        spk0 = jnp.zeros((B,), jnp.int32)
        variants = {
            "xla": dict(),
            "pallas_v3": dict(use_pallas=True,
                              pallas_opts={"v3": True, "tile_b": 8}),
            "pallas_v2": dict(use_pallas=True,
                              pallas_opts={"v2": True, "tile_b": 8}),
        }
        for name, kw in variants.items():
            if "pallas" in name and not on_tpu:
                continue
            try:
                init_state, push = streaming_fn(
                    params, m, frames_per_push=K,
                    compute_dtype=jnp.bfloat16 if on_tpu else None, **kw)
                carry = init_state(B, spk0, jax.random.PRNGKey(0))
                ms = time_push(push, carry, cond)
                res[f"B{B}_K{K}_{name}_ms"] = round(ms, 2)
                res[f"B{B}_K{K}_{name}_rtf"] = round(
                    K * m.lookback / 16000.0 / (ms / 1e3), 2)
            except Exception as e:  # noqa: BLE001 - report per-variant
                res[f"B{B}_K{K}_{name}_error"] = f"{type(e).__name__}: {e}"[:160]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
