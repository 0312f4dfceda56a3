#!/usr/bin/env python
"""Profile the training step on the current accelerator.

Measures, in-jit, per-variant wall time for the canonical (128, 1040)
TBPTT chunk: f32 vs bf16 mixed precision, xla vs pallas GRU, and a
forward-only / mlp-only decomposition. Run on the TPU to decide where the
next training-perf lever is.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scalarize(tree):
    """Reduce any output pytree to one scalar so `float()` is a real fence.

    On the axon remote platform `block_until_ready` does not fence, and
    `device_get` of a big pytree measures tunnel bandwidth — the only
    reliable sync is fetching a scalar.
    """
    import jax.numpy as jnp
    return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype")
               and jnp.issubdtype(x.dtype, jnp.floating))


def timeit(fn, *args, runs=10):
    wrapped = jax.jit(lambda *a: scalarize(fn(*a)))
    out = wrapped(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = wrapped(*args)
    float(out)
    return (time.perf_counter() - t0) / runs


if __name__ == "__main__":
    import jax
    from msnv_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from msnv_tpu.config import preset
    from msnv_tpu.models.samplernn import (
        init_params, init_tier_state, predictor_apply, sample_mlp_forward,
        sequence_nll_loss_bits)
    from msnv_tpu.training.optim import make_optimizer
    from msnv_tpu.training.step import make_train_step

    cfg = preset("samplernn")
    m = cfg.model
    B, L = 128, cfg.train.seq_len
    key = jax.random.PRNGKey(0)
    params = init_params(key, m)
    optimizer = make_optimizer(cfg.train)
    opt_state = optimizer.init(params)
    state = init_tier_state(m, B)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(0, 256, (B, L + m.lookback - 1)), jnp.int32)
    target = jnp.asarray(rng.randint(0, 256, (B, L)), jnp.int32)
    cond = jnp.asarray(rng.rand(B, L // m.lookback, m.effective_cond_dim),
                       jnp.float32)
    spk = jnp.asarray(rng.randint(0, m.spk_dim, (B,)), jnp.int32)
    reset = jnp.asarray(False)

    res = {}
    for gru in ("xla", "pallas"):
        for cd in (None, jnp.bfloat16):
            mm = dataclasses.replace(m, gru_impl=gru)
            step = make_train_step(mm, optimizer, donate=False,
                                   compute_dtype=cd)
            name = f"step_{gru}_{'bf16' if cd else 'f32'}"
            try:
                dt = timeit(step, params, opt_state, state, data, reset,
                            target, cond, spk)
                res[name] = round(dt * 1e3, 2)
                print(name, res[name], "ms", flush=True)
            except Exception as e:  # pallas+bf16 may be unsupported
                print(name, "FAILED:", repr(e)[:200], flush=True)

    # forward-only (f32, xla)
    fwd = jax.jit(lambda p, s: predictor_apply(p, m, data, reset, cond,
                                               spk, s)[0])
    res["forward_f32"] = round(timeit(fwd, params, state) * 1e3, 2)
    print("forward_f32", res["forward_f32"], "ms", flush=True)

    # MLP fwd+bwd in isolation
    upper = jnp.asarray(rng.rand(B, L, m.dim), jnp.float32)
    mlp_in = data[:, m.lookback - m.frame_sizes[0]:]

    def mlp_loss(mp, up):
        lp = sample_mlp_forward(mp, m, mlp_in, up)
        return sequence_nll_loss_bits(lp, target)

    g = jax.jit(jax.grad(mlp_loss, argnums=(0, 1)))
    res["mlp_fwdbwd_f32"] = round(
        timeit(g, params["mlp"], upper) * 1e3, 2)
    print("mlp_fwdbwd_f32", res["mlp_fwdbwd_f32"], "ms", flush=True)

    def mlp_loss16(mp, up):
        from msnv_tpu.models.generate import cast_float_tree
        lp = sample_mlp_forward(cast_float_tree(mp, jnp.bfloat16), m,
                                mlp_in, up.astype(jnp.bfloat16))
        return sequence_nll_loss_bits(lp, target)

    g16 = jax.jit(jax.grad(mlp_loss16, argnums=(0, 1)))
    res["mlp_fwdbwd_bf16"] = round(
        timeit(g16, params["mlp"], upper) * 1e3, 2)
    print("mlp_fwdbwd_bf16", res["mlp_fwdbwd_bf16"], "ms", flush=True)

    print(json.dumps(res))
