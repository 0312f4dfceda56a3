#!/usr/bin/env python
"""Streaming-serving demo: real-time-factor of the push API.

Simulates a synthesis server: N concurrent streams (one batch lane each)
receive conditioner frames one at a time and must emit the corresponding
80 samples (5 ms of 16 kHz audio) before the next frame arrives. Measures
per-push latency of `models/generate.streaming_fn` — the O(1)-state
incremental generation path — and reports how many concurrent real-time
streams one chip sustains.

Real-time budget per push: cond_len / 16000 s (5 ms at the canonical
config). A lane is real-time iff mean push latency < that budget; because
all lanes advance in one batched push, the sustainable stream count is
  batch * (budget / latency)  evaluated at the largest batch where
  latency < budget.

Usage:
  python scripts/serve_demo.py [--batches 1,8,64,256] [--frames 64]
          [--engine auto|xla|pallas] [--preset samplernn]
          [--frames_per_push K]   # K-frame chunked pushes: amortizes
                                  # dispatch, budget scales to K*5 ms
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,64,256")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "xla", "pallas"])
    ap.add_argument("--preset", default="samplernn")
    ap.add_argument("--frames_per_push", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from msnv_tpu.config import preset
    from msnv_tpu.models.generate import streaming_fn
    from msnv_tpu.models.samplernn import init_params

    from msnv_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    cfg = preset(args.preset)
    m = cfg.model
    engine = args.engine
    if engine == "auto":
        engine = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    params = init_params(jax.random.PRNGKey(0), m)

    K = args.frames_per_push
    budget_ms = K * m.cond_len / 16000.0 * 1e3
    print(f"preset={args.preset} engine={engine} frames_per_push={K} "
          f"budget={budget_ms:.2f} ms per {K * m.cond_len}-sample push")

    rng = np.random.RandomState(0)
    best = 0.0
    for batch in [int(b) for b in args.batches.split(",")]:
        if engine == "pallas":
            init_state, push = streaming_fn(
                params, m, compute_dtype=jnp.bfloat16, use_pallas=True,
                pallas_opts={"v3": True, "tile_b": 128}, frames_per_push=K)
        else:
            init_state, push = streaming_fn(params, m, frames_per_push=K)
        spk = jnp.asarray(rng.randint(0, m.spk_dim, (batch,)), jnp.int32)
        carry = init_state(batch, spk, jax.random.PRNGKey(1))
        shape = ((args.frames, batch, m.effective_cond_dim) if K == 1
                 else (args.frames, batch, K, m.effective_cond_dim))
        frames = jnp.asarray(rng.rand(*shape), jnp.float32)
        # warmup / compile; sync by VALUE transfer — block_until_ready
        # does not reliably fence on the remote axon platform (bench.py)
        carry, audio, _ = push(carry, frames[0])
        float(audio[-1, -1])
        t0 = time.perf_counter()
        for i in range(1, args.frames):
            carry, audio, _ = push(carry, frames[i])
        float(audio[-1, -1])
        ms = (time.perf_counter() - t0) / (args.frames - 1) * 1e3
        rtf = budget_ms / ms
        streams = batch * rtf
        ok = "realtime" if rtf >= 1.0 else "NOT realtime"
        print(f"  batch {batch:5d}: {ms:7.2f} ms/push  "
              f"rtf {rtf:6.2f}x  ~{streams:8.0f} concurrent streams  [{ok}]")
        if rtf >= 1.0:
            best = max(best, streams)
    if best:
        print(f"sustainable real-time streams on this chip: ~{best:.0f}")


if __name__ == "__main__":
    main()
