#!/usr/bin/env python
"""Data-parallel scaling benchmark harness.

Measures train-step throughput at increasing data-axis widths over the
available devices and reports scaling efficiency vs 1 device. On a 1-chip
box it degenerates to the single-device number; on a pod slice it produces
the 1 chip -> 1 host -> N hosts curve (the SURVEY.md §7 harness). Run with
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 to
exercise the code path without TPUs (virtual-device perf is meaningless but
correctness and the harness itself are real).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="samplernn",
                    help="config preset (use tiny_unconditional for CPU)")
    ap.add_argument("--per_device_batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from msnv_tpu.config import preset
    from msnv_tpu.models.samplernn import init_params, init_tier_state
    from msnv_tpu.parallel.mesh import make_mesh
    from msnv_tpu.training.optim import make_optimizer
    from msnv_tpu.training.step import make_train_step

    cfg = preset(args.preset)
    m = cfg.model
    devices = jax.devices()
    n_dev = len(devices)
    per_device_batch = args.per_device_batch
    seq_len = cfg.train.seq_len

    params = init_params(jax.random.PRNGKey(0), m)
    optimizer = make_optimizer(cfg.train)
    rng = np.random.RandomState(0)

    results = []
    widths = [w for w in (1, 2, 4, 8, 16, 32) if w <= n_dev]
    for n_data in widths:
        B = per_device_batch * n_data
        opt_state = optimizer.init(params)
        state = init_tier_state(m, B)
        data = jnp.asarray(rng.randint(0, 256, (B, seq_len + m.lookback - 1)),
                           jnp.int32)
        target = jnp.asarray(rng.randint(0, 256, (B, seq_len)), jnp.int32)
        cond = jnp.asarray(rng.rand(B, seq_len // m.lookback,
                                    m.effective_cond_dim), jnp.float32)
        spk = jnp.asarray(rng.randint(0, m.spk_dim, (B,)), jnp.int32)
        if n_data == 1 and n_dev == 1:
            step = make_train_step(m, optimizer, donate=False)
        else:
            mesh = make_mesh(n_data=n_data, n_model=1,
                             devices=devices[:n_data])
            step = make_train_step(m, optimizer, mesh=mesh, donate=False)(
                params, opt_state, state)
        out = step(params, opt_state, state, data, jnp.asarray(True),
                   target, cond, spk)
        float(out[3])   # value sync (see bench.py: block does not fence
        t0 = time.perf_counter()   # reliably on the remote platform)
        for _ in range(5):
            out = step(params, opt_state, state, data, jnp.asarray(False),
                       target, cond, spk)
        float(out[3])
        dt = (time.perf_counter() - t0) / 5
        tput = B * seq_len / dt
        results.append({"n_data": n_data, "global_batch": B,
                        "samples_per_s": round(tput),
                        "ms_per_step": round(dt * 1e3, 2)})
        base = results[0]["samples_per_s"]
        results[-1]["scaling_efficiency"] = round(
            tput / (base * n_data), 3)
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"devices": n_dev,
                      "device_kind": devices[0].device_kind,
                      "per_device_batch": per_device_batch,
                      "results": results}))


if __name__ == "__main__":
    main()
