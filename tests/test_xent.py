"""Fused NLL-from-logits (ops/xent.py) parity vs log_softmax + gather."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msnv_tpu.models.samplernn import sequence_nll_loss_bits
from msnv_tpu.ops.xent import nll_bits_from_logits


@pytest.mark.parametrize("shape", [(4, 7, 16), (2, 1040, 256), (1, 3, 4)])
def test_value_and_grad_parity(shape):
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(*shape) * 3, jnp.float32)
    targets = jnp.asarray(rng.randint(0, shape[-1], shape[:-1]), jnp.int32)

    def ref(lg):
        return sequence_nll_loss_bits(jax.nn.log_softmax(lg, -1), targets)

    def fused(lg):
        return nll_bits_from_logits(lg, targets)

    v_r, g_r = jax.value_and_grad(ref)(logits)
    v_f, g_f = jax.value_and_grad(fused)(logits)
    np.testing.assert_allclose(v_f, v_r, rtol=1e-6)
    np.testing.assert_allclose(g_f, g_r, rtol=1e-5, atol=1e-7)


def test_extreme_logits_stable():
    logits = jnp.asarray([[1e4, -1e4, 0.0], [-1e4, 1e4, 5.0]], jnp.float32)
    targets = jnp.asarray([0, 2], jnp.int32)
    v, g = jax.value_and_grad(nll_bits_from_logits)(logits, targets)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    ref = sequence_nll_loss_bits(jax.nn.log_softmax(logits, -1), targets)
    np.testing.assert_allclose(float(v), float(ref), rtol=1e-6)


def test_train_step_loss_matches_log_prob_path():
    """The fused logits+NLL path equals the log-prob formulation, AND
    make_train_step's first reported loss (which wires that fused path)
    matches the hand-computed log-prob loss on the same chunk."""
    from msnv_tpu.config import preset
    from msnv_tpu.models.samplernn import (init_params, init_tier_state,
                                           predictor_apply)
    from msnv_tpu.training.optim import make_optimizer
    from msnv_tpu.training.step import make_train_step
    cfg = preset("tiny_unconditional")
    m = cfg.model
    params = init_params(jax.random.PRNGKey(0), m)
    state = init_tier_state(m, 2)
    rng = np.random.RandomState(1)
    L = cfg.train.seq_len
    data = jnp.asarray(rng.randint(0, m.q_levels, (2, L + m.lookback - 1)),
                       jnp.int32)
    target = jnp.asarray(rng.randint(0, m.q_levels, (2, L)), jnp.int32)
    cond = jnp.zeros((2, L // m.lookback, m.effective_cond_dim), jnp.float32)
    spk = jnp.zeros((2,), jnp.int32)
    lp, _, _ = predictor_apply(params, m, data, jnp.asarray(True), cond,
                               spk, state)
    lg, _, _ = predictor_apply(params, m, data, jnp.asarray(True), cond,
                               spk, state, output="logits")
    np.testing.assert_allclose(np.asarray(jax.nn.log_softmax(lg, -1)),
                               np.asarray(lp), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(nll_bits_from_logits(lg, target)),
                               float(sequence_nll_loss_bits(lp, target)),
                               rtol=1e-6)
    # and through the ACTUAL train step (covers step.py's wiring: target
    # slicing, f32 upcast, fused loss)
    opt = make_optimizer(cfg.train)
    step = make_train_step(m, opt, donate=False)
    _, _, _, loss = step(params, opt.init(params), state, data,
                         jnp.asarray(True), target, cond, spk)
    np.testing.assert_allclose(float(loss),
                               float(sequence_nll_loss_bits(lp, target)),
                               rtol=1e-6)
