"""Fused Pallas GRU layer (pallas/gru_kernel.py): forward and gradient
parity against the lax.scan reference, plus full-model integration with
cfg.gru_impl="pallas". Runs in Pallas interpret mode on CPU (f32, exact)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.samplernn import (init_params, init_tier_state,
                                       predictor_apply,
                                       sequence_nll_loss_bits)
from msnv_tpu.ops.gru import gru_apply, gru_init
from msnv_tpu.pallas.gru_kernel import gru_layer, supported

B, T, H = 8, 5, 128     # minimal aligned shapes (H % 128, B % 8)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    xp = jnp.asarray(rng.randn(T, B, 3 * H) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(H, 3 * H) * (1.0 / np.sqrt(H)), jnp.float32)
    b = jnp.asarray(rng.randn(3 * H) * 0.1, jnp.float32)
    h0 = jnp.asarray(rng.randn(B, H) * 0.5, jnp.float32)
    return xp, w, b, h0


def _scan_ref(xp, w, b, h0):
    """The ops/gru.py scan body, driven directly by x_proj."""
    def step(h, x):
        hp = jnp.dot(h, w) + b
        xr, xz, xn = jnp.split(x, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new
    hT, ys = jax.lax.scan(step, h0, xp)
    return ys, hT


def test_forward_matches_scan():
    xp, w, b, h0 = _inputs()
    ys_k, hT_k = gru_layer(xp, w, b, h0, jnp.float32, True)
    ys_r, hT_r = _scan_ref(xp, w, b, h0)
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hT_k), np.asarray(hT_r), atol=1e-6)


def test_gradients_match_scan():
    """d(loss)/d(xp, w, b, h0) through the custom VJP == autodiff through
    the scan, for a loss touching every output and the final state."""
    xp, w, b, h0 = _inputs(1)
    rng = np.random.RandomState(2)
    cy = jnp.asarray(rng.randn(T, B, H), jnp.float32)
    ch = jnp.asarray(rng.randn(B, H), jnp.float32)

    def loss_k(xp, w, b, h0):
        ys, hT = gru_layer(xp, w, b, h0, jnp.float32, True)
        return jnp.sum(ys * cy) + jnp.sum(hT * ch)

    def loss_r(xp, w, b, h0):
        ys, hT = _scan_ref(xp, w, b, h0)
        return jnp.sum(ys * cy) + jnp.sum(hT * ch)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(xp, w, b, h0)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(xp, w, b, h0)
    for a, r, name in zip(gk, gr, ["dxp", "dw", "db", "dh0"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-5,
                                   err_msg=name)


def test_supported_gate():
    assert supported(8, 128) and supported(128, 1024)
    assert not supported(8, 100) and not supported(3, 128)


def test_gru_apply_pallas_impl_matches_xla():
    """gru_apply(impl='pallas') == gru_apply(impl='xla') for 2 layers."""
    key = jax.random.PRNGKey(0)
    params = gru_init(key, 2, H, H)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, T, H), jnp.float32)
    h0 = jnp.asarray(rng.randn(2, B, H), jnp.float32)
    y_p, h_p = gru_apply(params, x, h0, impl="pallas")
    y_x, h_x = gru_apply(params, x, h0, impl="xla")
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), atol=1e-5)


def test_unsupported_shape_falls_back():
    """H not a lane multiple silently uses the scan path."""
    key = jax.random.PRNGKey(1)
    params = gru_init(key, 1, 24, 24)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 3, 24), jnp.float32)
    h0 = jnp.zeros((1, 2, 24), jnp.float32)
    y_p, _ = gru_apply(params, x, h0, impl="pallas")
    y_x, _ = gru_apply(params, x, h0, impl="xla")
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-6)


def test_full_model_training_step_parity():
    """One value_and_grad through predictor_apply with gru_impl='pallas'
    matches gru_impl='xla' (loss and every gradient leaf)."""
    base = ModelConfig(frame_sizes=(4, 4), n_rnn=2, dim=128, cond_dim=5,
                       spk_dim=3)
    cfgs = {"xla": base,
            "pallas": dataclasses.replace(base, gru_impl="pallas")}
    params = init_params(jax.random.PRNGKey(0), base)
    Bm, Tm = 8, 2 * base.lookback
    rng = np.random.RandomState(5)
    seq = jnp.asarray(rng.randint(0, base.q_levels, (Bm, Tm + base.lookback)),
                      jnp.int32)
    cond = jnp.asarray(rng.rand(Bm, Tm // base.lookback,
                                base.effective_cond_dim), jnp.float32)
    spk = jnp.asarray(rng.randint(0, base.spk_dim, (Bm,)), jnp.int32)
    state = init_tier_state(base, Bm)

    outs = {}
    for name, cfg in cfgs.items():
        def loss_fn(p):
            lp, _, _ = predictor_apply(p, cfg, seq[:, :-1], jnp.asarray(True),
                                       cond, spk, state)
            return sequence_nll_loss_bits(lp, seq[:, base.lookback:])
        outs[name] = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(outs["pallas"][0]),
                               float(outs["xla"][0]), atol=1e-5)
    flat_p = jax.tree_util.tree_leaves(outs["pallas"][1])
    flat_x = jax.tree_util.tree_leaves(outs["xla"][1])
    for a, r in zip(flat_p, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-5)
