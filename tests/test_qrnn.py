"""QRNN tier cell (cfg.qrnn=True): fo-pool recurrence correctness,
sequence/cell consistency, and full-model integration — training forward,
gradient step, TBPTT carry, and generation<->predictor equivalence.

The reference's qrnn flag is dead (both branches build a GRU, ref
model.py:133-153); here it selects the real fo-pooled QRNN in
msnv_tpu/ops/qrnn.py.
"""

import numpy as np

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.generate import generate_fn, teacher_forced_log_probs
from msnv_tpu.models.samplernn import (init_params, init_tier_state,
                                       predictor_apply,
                                       sequence_nll_loss_bits)
from msnv_tpu.ops.qrnn import qrnn_apply, qrnn_cell, qrnn_init
from msnv_tpu.ops.quantize import q_zero


def test_fo_pool_recurrence_manual():
    """qrnn_apply matches a hand-rolled numpy fo-pool on one layer."""
    key = jax.random.PRNGKey(0)
    B, T, D, H = 2, 5, 3, 4
    params = qrnn_init(key, 1, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    c0 = jax.random.normal(jax.random.PRNGKey(2), (1, B, H))

    w = np.asarray(params[0]["w"])          # (3H, D), gates [z, f, o]
    xs = np.asarray(x)
    g = xs @ w.T                            # (B, T, 3H)
    z = np.tanh(g[..., :H])
    f = 1.0 / (1.0 + np.exp(-g[..., H:2 * H]))
    o = 1.0 / (1.0 + np.exp(-g[..., 2 * H:]))
    c = np.asarray(c0[0])
    ys = np.zeros((B, T, H), np.float32)
    for t in range(T):
        c = f[:, t] * c + (1.0 - f[:, t]) * z[:, t]
        ys[:, t] = o[:, t] * c

    y, cT = qrnn_apply(params, x, c0)
    np.testing.assert_allclose(np.asarray(y), ys, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT[0]), c, atol=1e-5)


def test_cell_matches_sequence():
    """Stepping qrnn_cell T times == qrnn_apply on the whole sequence."""
    key = jax.random.PRNGKey(3)
    B, T, D, H, L = 3, 7, 6, 5, 2
    params = qrnn_init(key, L, D, H)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, D))
    c0 = jax.random.normal(jax.random.PRNGKey(5), (L, B, H))

    y_seq, c_seq = qrnn_apply(params, x, c0)

    c = c0
    ys = []
    for t in range(T):
        y, c = qrnn_cell(params, x[:, t], c)
        ys.append(y)
    np.testing.assert_allclose(np.asarray(jnp.stack(ys, 1)),
                               np.asarray(y_seq), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_seq), atol=1e-5)


def _qrnn_cfg():
    return ModelConfig(frame_sizes=(4, 4), n_rnn=2, dim=16, cond_dim=5,
                       spk_dim=3, qrnn=True)


def test_model_forward_and_grad():
    """Full SampleRNN with QRNN tiers: forward shapes, finite loss + grads,
    and the TBPTT state pytree keeps the GRU-compatible layout."""
    cfg = _qrnn_cfg()
    B, T = 2, 2 * cfg.lookback
    params = init_params(jax.random.PRNGKey(0), cfg)
    # param layout: QRNN layers have {w, b}, not {w_ih, w_hh, ...}
    assert set(params["tiers"][0]["gru"][0]) == {"w", "b"}

    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.randint(0, cfg.q_levels,
                                  (B, T + cfg.lookback)), jnp.int32)
    cond = jnp.asarray(rng.rand(B, T // cfg.lookback,
                                cfg.effective_cond_dim), jnp.float32)
    spk = jnp.asarray(rng.randint(0, cfg.spk_dim, (B,)), jnp.int32)
    state = init_tier_state(cfg, B)
    assert state[0].shape == (cfg.n_rnn, B, cfg.dim)

    def loss_fn(p):
        lp, new_state, _ = predictor_apply(p, cfg, seq[:, :-1],
                                           jnp.asarray(True), cond, spk,
                                           state)
        assert lp.shape == (B, T, cfg.q_levels)
        tgt = seq[:, cfg.lookback:]
        return sequence_nll_loss_bits(lp, tgt), new_state

    (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert new_state[0].shape == (cfg.n_rnn, B, cfg.dim)


def test_generation_matches_predictor():
    """Teacher-forced generation twin == training predictor with QRNN tiers
    (the same equivalence gate as the GRU path)."""
    cfg = _qrnn_cfg()
    B, frames = 2, 3
    T = frames * cfg.lookback
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    cond = jnp.asarray(rng.rand(B, frames, cfg.effective_cond_dim),
                       jnp.float32)
    spk = jnp.asarray(rng.randint(0, cfg.spk_dim, (B,)), jnp.int32)
    forced = jnp.asarray(rng.randint(0, cfg.q_levels, (B, T)), jnp.int32)

    lp_gen = teacher_forced_log_probs(params, cfg)(cond, spk, forced)

    seed_buf = jnp.full((B, cfg.lookback), q_zero(cfg.q_levels), jnp.int32)
    full = jnp.concatenate([seed_buf, forced], axis=1)
    lp_pred, _, _ = predictor_apply(params, cfg, full[:, :-1],
                                    jnp.asarray(True), cond, spk,
                                    init_tier_state(cfg, B))
    np.testing.assert_allclose(np.asarray(lp_gen), np.asarray(lp_pred),
                               atol=5e-5)


def test_generate_runs():
    """Sampling path produces in-range levels and audio in [-1, 1]."""
    cfg = _qrnn_cfg()
    B, frames = 2, 3
    params = init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(2)
    cond = jnp.asarray(rng.rand(B, frames, cfg.effective_cond_dim),
                       jnp.float32)
    spk = jnp.asarray(rng.randint(0, cfg.spk_dim, (B,)), jnp.int32)
    audio, seq = generate_fn(params, cfg)(cond, spk, jax.random.PRNGKey(3))
    assert seq.shape == (B, frames * cfg.lookback)
    assert int(seq.min()) >= 0 and int(seq.max()) < cfg.q_levels
    assert float(jnp.abs(audio).max()) <= 1.0
