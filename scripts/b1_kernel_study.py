#!/usr/bin/env python
"""B=1 interactive operating-point study (VERDICT r03 item 6).

The reference's generate.py synthesizes ONE utterance at a time
(ref generate.py:154-253, model.py:462-517); our interactive envelope at
B=1 K=1 measured push 1.6-2.1 ms (RTF ~3) with the v2 window kernel's
default tile_b=32 — i.e. the single real lane is zero-padded up to 32
kernel lanes. Round-3 ROADMAP noted two untried levers at B=1:

- **B-specialized tile** (tile_b 8/16): the padded matmuls shrink
  (8, fs0*q)x(fs0*q, dim) instead of (32, ...) — less VMEM traffic per
  sample even if MXU passes are contraction-bound.
- **int8 table**: rejected at B=1024 because Mosaic lowers int8 matmul
  off the fast path (32 vs 2 us in isolation, docs/DESIGN.md) — that
  instruction-selection fact is batch-independent, so it is not re-built
  here; this study records the tile sweep instead.

Measures, at the flagship config (dim 1024, fs 20/4):
  push_ms + stream RTF + first-audio for B=1 K in {1,4} at
  tile_b in {8, 16, 32} (v2), plus the XLA no-pallas baseline.

Writes docs/b1_kernel_study.json and prints one JSON line per cell.
Run on the real chip: python scripts/b1_kernel_study.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pushes", type=int, default=50)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "b1_kernel_study.json"))
    args = p.parse_args()

    import jax
    from msnv_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax.numpy as jnp
    from msnv_tpu.config import preset
    from msnv_tpu.models.generate import streaming_fn
    from msnv_tpu.models.samplernn import init_params

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = preset("samplernn")
    m = cfg.model
    params = init_params(jax.random.PRNGKey(0), m)
    rng = np.random.RandomState(0)
    results = []

    cells = []
    for K in (1, 4):
        for tile in (8, 16, 32):
            cells.append((K, {"v2": True, "tile_b": tile}, f"v2_tile{tile}"))
        cells.append((K, None, "xla"))

    for K, popts, label in cells:
        use_pallas = popts is not None and on_tpu
        init_state, push = streaming_fn(
            params, m, frames_per_push=K,
            compute_dtype=jnp.bfloat16 if on_tpu else None,
            use_pallas=use_pallas, pallas_opts=popts if use_pallas else None)
        B = 1
        spk0 = jnp.zeros((B,), jnp.int32)
        cond = jnp.asarray(
            rng.rand(B, K, m.effective_cond_dim).squeeze(1) if K == 1
            else rng.rand(B, K, m.effective_cond_dim), jnp.float32)
        carry = init_state(B, spk0, jax.random.PRNGKey(0))
        carry, a, _ = push(carry, cond)          # compile + warm
        float(a[-1, -1])                         # value-transfer sync
        t0 = time.perf_counter()
        c2 = init_state(B, spk0, jax.random.PRNGKey(1))
        _, a, _ = push(c2, cond)
        float(a[-1, -1])
        first_audio_ms = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        for _ in range(args.pushes):
            carry, a, _ = push(carry, cond)
        float(a[-1, -1])
        dt = (time.perf_counter() - t0) / args.pushes
        audio_s = K * m.lookback / 16000.0
        cell = {"label": label, "B": 1, "K": K,
                "push_ms": round(dt * 1e3, 3),
                "stream_rtf": round(audio_s / dt, 2),
                "first_audio_ms": round(first_audio_ms, 1)}
        results.append(cell)
        print(json.dumps(cell), flush=True)

    best = min((r for r in results if r["K"] == 1),
               key=lambda r: r["push_ms"])
    report = {
        "study": "B=1 interactive window-kernel tile sweep "
                 "(scripts/b1_kernel_study.py)",
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "int8_note": "not re-built: Mosaic lowers int8 matmul off the "
                     "fast path (32 vs 2 us in isolation, docs/DESIGN.md "
                     "round-1 study) — instruction selection is "
                     "batch-independent",
        "cells": results,
        "best_K1": best,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
