#!/usr/bin/env python
"""Decompose the GAN train-step cost on the real chip.

Times, at the ref config (B=64, seq 1040, ind_cond_dim 50, 4x512 resblock
discriminator):
  1. discriminator forward alone (f32 and bf16)
  2. discriminator forward + backward wrt (params, latent)
  3. vocoder-only (identity-core) fwd+bwd at B=64
  4. full current GAN step
Prints a JSON dict of milliseconds + a FLOP model.
"""
import dataclasses as dc
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
from msnv_tpu.models.discriminator import (
    discriminator_init, discriminator_nll)
from msnv_tpu.models.samplernn import init_params, init_tier_state
from msnv_tpu.training.gan import make_gan_train_step
from msnv_tpu.training.optim import make_optimizer
from msnv_tpu.training.step import make_train_step


def timeit(fn, *args, n=10):
    """CAVEAT: syncs by fetching EVERY output leaf to the host, so
    timings of functions with large outputs (full grad trees / updated
    params) are dominated by tunnel transfer, not device compute — only
    the scalar-output discriminator timings here are clean. For true
    step timings use bench.py's chained loops (sync on the loss only)."""
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(np.asarray(jax.device_get(x)).ravel()[-1]), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(np.asarray(jax.device_get(x)).ravel()[-1]), out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.RandomState(0)
    gcfg = preset("samplernn_gan")
    m = gcfg.model
    on_tpu = jax.devices()[0].platform == "tpu"
    m = dc.replace(m, gru_impl="pallas" if on_tpu else "xla")
    B = 64
    T = gcfg.train.seq_len // m.lookback       # 13
    C = m.ind_cond_dim                         # 50
    spk_dim = m.spk_dim
    res = {}

    disc = discriminator_init(jax.random.PRNGKey(1), spk_dim)
    latent = jnp.asarray(rng.rand(B, T, C), jnp.float32)
    spk = jnp.asarray(rng.randint(0, spk_dim, (B,)), jnp.int32)

    # 1. forward only
    fwd = jax.jit(discriminator_nll)
    res["disc_fwd_f32_ms"] = timeit(fwd, disc, latent, spk)
    disc16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), disc)
    fwd16 = jax.jit(discriminator_nll)
    res["disc_fwd_bf16_ms"] = timeit(
        fwd16, disc16, latent.astype(jnp.bfloat16), spk)

    # 2. fwd + bwd wrt both args
    g_both = jax.jit(jax.value_and_grad(discriminator_nll, argnums=(0, 1)))
    res["disc_fwd_bwd_both_f32_ms"] = timeit(g_both, disc, latent, spk)
    res["disc_fwd_bwd_both_bf16_ms"] = timeit(
        g_both, disc16, latent.astype(jnp.bfloat16), spk)

    # 2b. fwd + bwd wrt latent only (what main_loss pays)
    g_lat = jax.jit(jax.value_and_grad(discriminator_nll, argnums=1))
    res["disc_fwd_bwd_latent_f32_ms"] = timeit(g_lat, disc, latent, spk)
    # 2c. fwd + bwd wrt params only (what the disc opt pays)
    g_par = jax.jit(jax.value_and_grad(discriminator_nll, argnums=0))
    res["disc_fwd_bwd_params_f32_ms"] = timeit(g_par, disc, latent, spk)

    # 3. vocoder-only identity step at B=64 (gan cfg minus variant)
    id_m = dc.replace(m, variant="identity")
    id_params = init_params(jax.random.PRNGKey(0), id_m)
    opt = make_optimizer(gcfg.train)
    id_opt = opt.init(id_params)
    id_state = init_tier_state(id_m, B)
    seq = gcfg.train.seq_len
    data = jnp.asarray(rng.randint(0, 256, (B, seq + m.lookback - 1)),
                       jnp.int32)
    target = jnp.asarray(rng.randint(0, 256, (B, seq)), jnp.int32)
    cond = jnp.asarray(rng.rand(B, T, m.effective_cond_dim), jnp.float32)
    step = make_train_step(id_m, opt, donate=False,
                           compute_dtype=jnp.bfloat16 if on_tpu else None)
    res["vocoder_step_B64_ms"] = timeit(
        step, id_params, id_opt, id_state, data, jnp.asarray(False),
        target, cond, spk)

    # 4. full GAN step (current implementation)
    gparams = init_params(jax.random.PRNGKey(0), m)
    gdisc = discriminator_init(jax.random.PRNGKey(1), spk_dim)
    gmo, gdo = opt.init(gparams), opt.init(gdisc)
    gstate = init_tier_state(m, B)
    gstep = make_gan_train_step(
        m, gcfg.train, opt, opt, donate=False,
        compute_dtype=jnp.bfloat16 if on_tpu else None)
    res["gan_step_ms"] = timeit(
        gstep, gparams, gdisc, gmo, gdo, gstate, jnp.asarray(1.0),
        data, jnp.asarray(False), target, cond, spk, n=10)

    # FLOP model (per step, B=64)
    pos = T * C                      # 650 spatial positions
    conv_big = 2 * pos * 25 * 512 * 512 * B
    fwd_flops = conv_big * 7 + 2 * pos * 25 * 512 * B
    res["model"] = {
        "disc_fwd_tflop": fwd_flops / 1e12,
        "disc_fwd_bwd_both_tflop": 3 * fwd_flops / 1e12,
    }
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
