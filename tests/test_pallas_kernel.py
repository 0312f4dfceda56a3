"""Fused Pallas sample-window kernel: exact math parity with the XLA path.

Primary gate: with zero Gumbel noise the kernel's argmax samples must equal
a manual XLA loop over `_mlp_logits` — pure determinism, no sampling
ambiguity. A secondary full-generation test uses extreme output sharpening
(argmax-dominant categorical) plus end-to-end sanity checks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.generate import (_mlp_logits, fused_embed_conv,
                                      generate_fn)
from msnv_tpu.models.samplernn import init_params
from msnv_tpu.ops.linear import dense_weight
from msnv_tpu.pallas.sample_kernel import make_sample_window


def kernel_inputs(cfg, batch, seed=0, dtype=jnp.float32):
    params = init_params(jax.random.PRNGKey(seed), cfg)
    fused = fused_embed_conv(params["mlp"]).astype(dtype)
    fs0, q, dim = fused.shape
    rng = np.random.RandomState(seed)
    buf0 = jnp.asarray(rng.randint(0, q, (batch, fs0)), jnp.int32)
    slots = jnp.asarray(rng.randn(fs0, batch, dim), jnp.float32).astype(dtype)
    table = fused.reshape(fs0 * q, dim)
    wh = dense_weight(params["mlp"]["hidden"]).T.astype(dtype)
    bh = params["mlp"]["hidden"]["b"].astype(jnp.float32)[None, :]
    wo = dense_weight(params["mlp"]["out"]).T.astype(dtype)
    bo = params["mlp"]["out"]["b"].astype(jnp.float32)[None, :]
    return params, fused, (table, wh, bh, wo, bo, slots, buf0)


def xla_argmax_loop(params, fused, buf, slots):
    fs0 = fused.shape[0]
    outs = []
    for k in range(fs0):
        logits = _mlp_logits(params, fused, buf,
                             slots[k].astype(jnp.float32))
        s = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs.append(s)
        buf = jnp.concatenate([buf[:, 1:], s[:, None]], axis=1)
    return np.stack([np.asarray(o) for o in outs], axis=1)


@pytest.mark.parametrize("frame_sizes,tile_b", [((4, 4), 2), ((8, 4), 4),
                                                ((8, 4), 8)])
def test_kernel_exact_vs_xla_loop(frame_sizes, tile_b):
    cfg = ModelConfig(frame_sizes=frame_sizes, n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    batch = 8
    params, fused, args = kernel_inputs(cfg, batch)
    fs0, q, dim = fused.shape
    noise = jnp.zeros((fs0, batch, q), jnp.float32)
    kern = make_sample_window(fs0, q, dim, batch, tile_b=tile_b,
                              interpret=True)
    out_k = np.asarray(kern(*args, noise))
    out_x = xla_argmax_loop(params, fused, args[-1], args[-2])
    np.testing.assert_array_equal(out_k, out_x)


def test_kernel_gumbel_noise_changes_draws():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    batch = 4
    _, fused, args = kernel_inputs(cfg, batch)
    fs0, q, dim = fused.shape
    from msnv_tpu.pallas.sample_kernel import gumbel_noise
    kern = make_sample_window(fs0, q, dim, batch, tile_b=2, interpret=True)
    n1 = gumbel_noise(jax.random.PRNGKey(0), (fs0, batch, q))
    n2 = gumbel_noise(jax.random.PRNGKey(1), (fs0, batch, q))
    s1 = np.asarray(kern(*args, n1))
    s2 = np.asarray(kern(*args, n2))
    s1b = np.asarray(kern(*args, n1))
    np.testing.assert_array_equal(s1, s1b)  # deterministic per noise
    assert not np.array_equal(s1, s2)
    assert s1.min() >= 0 and s1.max() < q


def test_pallas_generate_full_path():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # extreme sharpening: categorical == argmax for both paths
    out = params["mlp"]["out"]
    params["mlp"]["out"] = {"w": out["w"] * 1e6, "b": out["b"] * 1e6}
    rng = np.random.RandomState(1)
    cond = jnp.asarray(rng.rand(4, 3, 5), jnp.float32)
    spk = jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32)
    gen_xla = generate_fn(params, cfg)
    gen_pal = generate_fn(params, cfg, use_pallas=True,
                          pallas_opts={"interpret": True, "tile_b": 2})
    _, seq_x = gen_xla(cond, spk, jax.random.PRNGKey(3))
    _, seq_p = gen_pal(cond, spk, jax.random.PRNGKey(3))
    mismatch = np.mean(np.asarray(seq_p) != np.asarray(seq_x))
    assert mismatch < 0.02, mismatch


def test_pallas_three_tier_runs():
    cfg = ModelConfig(frame_sizes=(4, 5, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    cond = jnp.asarray(rng.rand(2, 2, 5), jnp.float32)
    spk = jnp.asarray(rng.randint(0, 2, (2,)), jnp.int32)
    gen = generate_fn(params, cfg, use_pallas=True,
                      pallas_opts={"interpret": True, "tile_b": 2})
    audio, seq = gen(cond, spk, jax.random.PRNGKey(0))
    assert audio.shape == (2, 2 * cfg.lookback)
    s = np.asarray(seq)
    assert s.min() >= 0 and s.max() < cfg.q_levels
