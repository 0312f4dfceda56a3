"""Gradient parity of the fused embed+conv custom VJP (ops/embed_conv.py).

The fused path reassociates the backward through the composite table
T[j] = E @ w[j]; mathematically exact, so its gradients must match plain
autodiff to float tolerance on every shape, including through the
weight-norm chain and under bf16 compute.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.samplernn import sample_mlp_forward, \
    sequence_nll_loss_bits
from msnv_tpu.ops.embed_conv import embed_conv, embed_conv_direct


@pytest.mark.parametrize("B,S,q,e,h,k", [
    (2, 31, 16, 16, 24, 5),
    (3, 40, 8, 8, 8, 20),
    (1, 25, 32, 32, 16, 4),
])
def test_grad_parity_vs_autodiff(B, S, q, e, h, k):
    rng = np.random.RandomState(0)
    E = jnp.asarray(rng.randn(q, e), jnp.float32)
    w = jnp.asarray(rng.randn(k, e, h) * 0.1, jnp.float32)
    samples = jnp.asarray(rng.randint(0, q, (B, S)), jnp.int32)
    dy_seed = jnp.asarray(rng.randn(B, S - k + 1, h), jnp.float32)

    def loss(fn, E, w):
        return jnp.sum(fn(E, w, samples) * dy_seed)

    y_fused = embed_conv(E, w, samples)
    y_direct = embed_conv_direct(E, w, samples)
    np.testing.assert_allclose(y_fused, y_direct, rtol=0, atol=0)

    gE_f, gw_f = jax.grad(lambda E, w: loss(embed_conv, E, w),
                          argnums=(0, 1))(E, w)
    gE_d, gw_d = jax.grad(lambda E, w: loss(embed_conv_direct, E, w),
                          argnums=(0, 1))(E, w)
    np.testing.assert_allclose(gE_f, gE_d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw_f, gw_d, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("weight_norm", [False, True])
def test_mlp_grads_match_direct_impl(weight_norm):
    """Full sample-MLP loss gradients: cfg.mlp_grad_impl fused == direct,
    including through the weight-norm reparameterization."""
    cfg_f = ModelConfig(frame_sizes=(4, 2), dim=16, q_levels=16, spk_dim=2,
                        weight_norm=weight_norm, mlp_grad_impl="fused")
    cfg_d = dataclasses.replace(cfg_f, mlp_grad_impl="direct")
    rng = np.random.RandomState(1)
    q, fs0, dim = cfg_f.q_levels, cfg_f.frame_sizes[0], cfg_f.dim
    from msnv_tpu.models.samplernn import init_params
    mlp = init_params(jax.random.PRNGKey(1), cfg_f)["mlp"]
    B, L = 3, 24
    samples = jnp.asarray(rng.randint(0, q, (B, L + fs0 - 1)), jnp.int32)
    upper = jnp.asarray(rng.randn(B, L, dim), jnp.float32)
    target = jnp.asarray(rng.randint(0, q, (B, L)), jnp.int32)

    def loss(cfg, p):
        return sequence_nll_loss_bits(
            sample_mlp_forward(p, cfg, samples, upper), target)

    lf, gf = jax.value_and_grad(lambda p: loss(cfg_f, p))(mlp)
    ld, gd = jax.value_and_grad(lambda p: loss(cfg_d, p))(mlp)
    np.testing.assert_allclose(lf, ld, rtol=0, atol=0)
    for (kf, vf), (kd, vd) in zip(
            jax.tree_util.tree_leaves_with_path(gf),
            jax.tree_util.tree_leaves_with_path(gd)):
        assert jax.tree_util.keystr(kf) == jax.tree_util.keystr(kd)
        np.testing.assert_allclose(vf, vd, rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(kf))


def test_bf16_compute_dtype():
    """Fused path runs and matches direct under bf16 inputs (the
    mixed-precision training mode)."""
    rng = np.random.RandomState(2)
    q, e, h, k, B, S = 16, 16, 8, 4, 2, 19
    E = jnp.asarray(rng.randn(q, e), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, e, h) * 0.1, jnp.bfloat16)
    samples = jnp.asarray(rng.randint(0, q, (B, S)), jnp.int32)

    def loss(fn, E, w):
        return jnp.sum(fn(E, w, samples).astype(jnp.float32) ** 2)

    gE_f, gw_f = jax.grad(lambda E, w: loss(embed_conv, E, w),
                          argnums=(0, 1))(E, w)
    gE_d, gw_d = jax.grad(lambda E, w: loss(embed_conv_direct, E, w),
                          argnums=(0, 1))(E, w)
    assert gE_f.dtype == jnp.bfloat16 and gw_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gE_f, np.float32),
                               np.asarray(gE_d, np.float32),
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(gw_f, np.float32),
                               np.asarray(gw_d, np.float32),
                               rtol=0.1, atol=0.1)


def test_jit_and_vmap_compatible():
    rng = np.random.RandomState(3)
    q, e, h, k, B, S = 8, 8, 8, 3, 2, 12
    E = jnp.asarray(rng.randn(q, e), jnp.float32)
    w = jnp.asarray(rng.randn(k, e, h), jnp.float32)
    samples = jnp.asarray(rng.randint(0, q, (B, S)), jnp.int32)
    y = jax.jit(embed_conv)(E, w, samples)
    assert y.shape == (B, S - k + 1, h)
    g = jax.jit(jax.grad(lambda E: jnp.sum(embed_conv(E, w, samples))))(E)
    assert g.shape == E.shape
