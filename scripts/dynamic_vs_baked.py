#!/usr/bin/env python
"""On-chip A/B: params-as-arguments (dynamic) vs params-as-constants
(baked) generation programs at the flagship config.

Motivation: baked executables serialize ~350 MB each (weights are XLA
constants) — slow to load through a remote-backend tunnel and enough of
them exhaust the backend's program arena. The dynamic forms keep the
executable small; this script checks what that costs in steady-state
device time for (a) the B=1 K=1 streaming push (the /stream serving
path) and (b) batched generation at the bench operating point.

Usage: python scripts/dynamic_vs_baked.py [--gen_batch 1024] [--skip_gen]
Prints one JSON line; recorded in docs/VALIDATION.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen_batch", type=int, default=1024)
    ap.add_argument("--gen_frames", type=int, default=100)
    ap.add_argument("--skip_gen", action="store_true")
    ap.add_argument("--skip_stream", action="store_true")
    args = ap.parse_args()

    from msnv_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from msnv_tpu.config import preset
    from msnv_tpu.models.generate import (generate_fn, generate_fn_dynamic,
                                          streaming_fn, streaming_fn_dynamic)
    from msnv_tpu.models.samplernn import init_params

    cfg = preset("samplernn")
    m = cfg.model
    params = init_params(jax.random.PRNGKey(0), m)
    rng = np.random.RandomState(0)
    out = {"device": jax.devices()[0].device_kind}

    def record(name, fn):
        """Each measurement prints as it lands (a later section dying —
        e.g. the backend program arena filling up — keeps earlier
        results) and a failure is itself a recorded result."""
        try:
            out[name] = fn()
        except Exception as e:   # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({name: out[name]}), flush=True)

    # small (dynamic) programs measured FIRST, the ~350 MB baked ones
    # last, so an arena failure late keeps the interesting results
    if not args.skip_stream:
        spk1 = jnp.zeros((1,), jnp.int32)
        cond1 = jnp.asarray(rng.rand(1, m.effective_cond_dim), jnp.float32)

        def time_push(push, carry):
            # sync by VALUE transfer: block_until_ready does not reliably
            # fence on the remote axon platform (see bench.py train
            # section); fetching one element forces the whole chain
            carry, a, _ = push(carry, cond1)
            float(a[-1, -1])
            n = 50
            t0 = time.perf_counter()
            for _ in range(n):
                carry, a, _ = push(carry, cond1)
            float(a[-1, -1])
            return (time.perf_counter() - t0) / n * 1e3

        def stream_dynamic():
            idn, pd = streaming_fn_dynamic(m, compute_dtype=jnp.bfloat16)
            t0 = time.perf_counter()
            ms = time_push(lambda c, x: pd(params, c, x),
                           idn(params, 1, spk1, jax.random.PRNGKey(0)))
            return {"push_ms": round(ms, 2),
                    "total_wall_s": round(time.perf_counter() - t0, 1)}

        def stream_baked():
            ib, pb = streaming_fn(params, m, compute_dtype=jnp.bfloat16)
            t0 = time.perf_counter()
            ms = time_push(pb, ib(1, spk1, jax.random.PRNGKey(0)))
            return {"push_ms": round(ms, 2),
                    "total_wall_s": round(time.perf_counter() - t0, 1)}

        record("stream_dynamic", stream_dynamic)

    gen_makers = []
    if not args.skip_gen:
        B, F = args.gen_batch, args.gen_frames
        cond = jnp.asarray(rng.rand(B, F, m.effective_cond_dim), jnp.float32)
        spk = jnp.asarray(rng.randint(0, m.spk_dim, (B,)), jnp.int32)
        popts = {"v3": True, "tile_b": 128}

        checks = {}

        def time_gen(call, name):
            a, _ = call(jax.random.PRNGKey(1))
            # value-transfer sync (see time_push) + a checksum proving the
            # two forms computed the same audio for the same key
            checks[name] = float(jnp.sum(jnp.abs(a.astype(jnp.float32))))
            t0 = time.perf_counter()
            for i in range(3):
                a, _ = call(jax.random.PRNGKey(2))
            float(a[-1, -1])
            return (time.perf_counter() - t0) / 3

        def gen_result(call, name):
            t0 = time.perf_counter()
            dt = time_gen(call, name)
            return {"wall_s": round(dt, 3),
                    "audio_s_per_s": round(B * F * m.lookback / 16000.0 / dt,
                                           1),
                    "warmup_abs_sum": round(checks[name], 1),
                    "total_wall_s": round(time.perf_counter() - t0, 1)}

        def gen_dynamic():
            gd = generate_fn_dynamic(m, compute_dtype=jnp.bfloat16,
                                     use_pallas=True, pallas_opts=popts)
            return gen_result(lambda k: gd(params, cond, spk, k), "dyn")

        def gen_baked():
            gb = generate_fn(params, m, compute_dtype=jnp.bfloat16,
                             use_pallas=True, pallas_opts=popts)
            return gen_result(lambda k: gb(cond, spk, k), "baked")

        record("gen_dynamic", gen_dynamic)
        gen_makers.append(gen_baked)

    if not args.skip_stream:
        record("stream_baked", stream_baked)
    for gb_fn in gen_makers:
        record("gen_baked", gb_fn)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
