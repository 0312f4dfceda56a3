"""Eigen-voice speaker interpolation: float mixing weights over speaker
embeddings at generation time (thesis §3.3 capability)."""

import numpy as np

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.generate import generate_fn
from msnv_tpu.models.samplernn import init_params


def test_speaker_mixture_matches_onehot():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.rand(2, 2, 5), jnp.float32)
    gen = generate_fn(params, cfg)

    # one-hot float weights must equal integer speaker ids exactly
    spk_int = jnp.asarray([1, 2], jnp.int32)
    onehot = jnp.asarray(np.eye(3, dtype=np.float32)[[1, 2]])
    _, s_int = gen(cond, spk_int, jax.random.PRNGKey(1))
    _, s_hot = gen(cond, onehot, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(s_int), np.asarray(s_hot))


def test_speaker_blend_differs_from_endpoints():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.rand(1, 3, 5), jnp.float32)
    gen = generate_fn(params, cfg)
    blend = jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32)
    _, s_blend = gen(cond, blend, jax.random.PRNGKey(2))
    _, s_a = gen(cond, jnp.asarray([0], jnp.int32), jax.random.PRNGKey(2))
    _, s_b = gen(cond, jnp.asarray([1], jnp.int32), jax.random.PRNGKey(2))
    s = np.asarray(s_blend)
    assert not np.array_equal(s, np.asarray(s_a))
    assert not np.array_equal(s, np.asarray(s_b))
    assert s.min() >= 0 and s.max() < 256
