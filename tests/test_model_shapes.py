"""Shape goldens for the predictor forward, from the reference's embedded
shape traces (ref model.py:183-194, 368-375, 430-432) scaled to a small dim,
plus the full-size canonical shape chain on a reduced batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.samplernn import (
    init_params, init_tier_state, predictor_apply, sequence_nll_loss_bits,
)


def run_forward(cfg, seq_len, batch):
    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    state = init_tier_state(cfg, batch)
    rng = np.random.RandomState(0)
    seqs = jnp.asarray(rng.randint(0, cfg.q_levels,
                                   (batch, seq_len + cfg.lookback - 1)),
                       jnp.int32)
    n_frames = seq_len // cfg.lookback
    cond = jnp.asarray(rng.rand(batch, n_frames, cfg.effective_cond_dim),
                       jnp.float32)
    spk = jnp.asarray(rng.randint(0, cfg.spk_dim, (batch,)), jnp.int32)
    return predictor_apply(params, cfg, seqs, jnp.asarray(True), cond, spk,
                           state)


def test_canonical_shape_chain_small_dim():
    # frame_sizes (20, 4) -> ns_frame_samples (20, 80), lookback 80,
    # seq_len 1040 -> 13 top frames, 52 mid frames, 1040 outputs.
    cfg = ModelConfig(frame_sizes=(20, 4), n_rnn=2, dim=32, cond_dim=43,
                      spk_dim=6, look_ahead=True)
    assert cfg.ns_frame_samples == (20, 80)
    assert cfg.lookback == 80
    assert cfg.effective_cond_dim == 86

    log_probs, state, latent = run_forward(cfg, seq_len=1040, batch=4)
    assert log_probs.shape == (4, 1040, 256)
    assert latent is None
    assert len(state) == 2
    for h in state:
        assert h.shape == (2, 4, 32)
    # log-probs normalized
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_probs).sum(-1)), 1.0, atol=1e-4)


def test_three_tier_shapes():
    cfg = ModelConfig(frame_sizes=(4, 5, 4), n_rnn=1, dim=16, cond_dim=7,
                      spk_dim=2)
    assert cfg.ns_frame_samples == (4, 20, 80)
    log_probs, state, _ = run_forward(cfg, seq_len=160, batch=2)
    assert log_probs.shape == (2, 160, 256)
    assert len(state) == 3


def test_loss_bits():
    # Uniform log-probs -> exactly log2(q) bits.
    q = 256
    lp = jnp.full((2, 10, q), -np.log(q))
    tgt = jnp.zeros((2, 10), jnp.int32)
    loss = sequence_nll_loss_bits(lp, tgt)
    np.testing.assert_allclose(float(loss), 8.0, atol=1e-5)


def test_reset_uses_learned_h0():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=8, cond_dim=3,
                      spk_dim=1)
    key = jax.random.PRNGKey(1)
    params = init_params(key, cfg)
    # Give h0 a recognizable value and check reset-select picks it up.
    params["tiers"][0]["h0"] = jnp.ones_like(params["tiers"][0]["h0"]) * 0.7
    batch = 2
    state = [jnp.full_like(s, -0.3) for s in init_tier_state(cfg, batch)]
    rng = np.random.RandomState(0)
    seq_len = 32
    seqs = jnp.asarray(rng.randint(0, 256, (batch, seq_len + cfg.lookback - 1)),
                       jnp.int32)
    cond = jnp.zeros((batch, seq_len // cfg.lookback, 3), jnp.float32)
    spk = jnp.zeros((batch,), jnp.int32)

    out_reset, _, _ = predictor_apply(params, cfg, seqs, jnp.asarray(True),
                                      cond, spk, state)
    out_carry, _, _ = predictor_apply(params, cfg, seqs, jnp.asarray(False),
                                      cond, spk, state)
    assert not np.allclose(np.asarray(out_reset), np.asarray(out_carry))


def test_variant_heads_forward():
    for variant in ("bottleneck", "gan"):
        cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=43,
                          spk_dim=3, variant=variant, ind_cond_dim=10)
        log_probs, _, latent = run_forward(cfg, seq_len=64, batch=2)
        assert log_probs.shape == (2, 64, 256)
        assert latent is not None
        assert latent.shape == (2, 64 // cfg.lookback, 10)
