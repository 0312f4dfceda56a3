"""Streaming generation: frame-by-frame push must reproduce batch
generate() exactly under the same key, with O(1) carried state."""

import numpy as np

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.generate import generate_fn, streaming_fn
from msnv_tpu.models.samplernn import init_params


def test_streaming_matches_batch_generate():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, frames = 2, 5
    cond = jnp.asarray(rng.rand(B, frames, 5), jnp.float32)
    spk = jnp.asarray([0, 1], jnp.int32)
    key = jax.random.PRNGKey(11)

    _, seq_batch = generate_fn(params, cfg)(cond, spk, key)

    init_state, push = streaming_fn(params, cfg)
    carry = init_state(B, spk, key)
    out = []
    for f in range(frames):
        carry, audio, samples = push(carry, cond[:, f])
        assert audio.shape == (B, cfg.lookback)
        out.append(np.asarray(samples))
    streamed = np.concatenate(out, axis=1)
    np.testing.assert_array_equal(streamed, np.asarray(seq_batch))


def test_streaming_unbounded_state_constant():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    init_state, push = streaming_fn(params, cfg)
    carry = init_state(1, jnp.asarray([0], jnp.int32))
    shapes0 = [x.shape for x in jax.tree_util.tree_leaves(carry)]
    rng = np.random.RandomState(1)
    for _ in range(20):  # stream 20 frames; state shape never grows
        carry, _, _ = push(carry, jnp.asarray(rng.rand(1, 5), jnp.float32))
    shapes1 = [x.shape for x in jax.tree_util.tree_leaves(carry)]
    assert shapes0 == shapes1


def test_multi_frame_push_matches_single():
    """frames_per_push=K equals K sequential 1-frame pushes exactly (the
    PRNG key threads through identical splits)."""
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    B, K, total = 2, 3, 6
    cond = jnp.asarray(rng.rand(B, total, 5), jnp.float32)
    spk = jnp.asarray([1, 0], jnp.int32)
    key = jax.random.PRNGKey(5)

    init1, push1 = streaming_fn(params, cfg)
    carry = init1(B, spk, key)
    singles = []
    for f in range(total):
        carry, _, s = push1(carry, cond[:, f])
        singles.append(np.asarray(s))
    ref = np.concatenate(singles, axis=1)

    initk, pushk = streaming_fn(params, cfg, frames_per_push=K)
    carry = initk(B, spk, key)
    chunks = []
    for c in range(total // K):
        carry, audio, s = pushk(carry, cond[:, c * K:(c + 1) * K])
        assert audio.shape == (B, K * cfg.lookback)
        chunks.append(np.asarray(s))
    np.testing.assert_array_equal(np.concatenate(chunks, axis=1), ref)


def test_dynamic_streaming_matches_baked():
    """streaming_fn_dynamic (params as call args, small executable) is
    sample-exact vs streaming_fn (params baked as constants), including
    multi-frame pushes and a second param set reusing the same compile."""
    from msnv_tpu.models.generate import streaming_fn_dynamic

    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    rng = np.random.RandomState(7)
    B, K, total = 2, 2, 6
    spk = jnp.asarray([0, 1], jnp.int32)
    key = jax.random.PRNGKey(9)
    cond = jnp.asarray(rng.rand(B, total, 5), jnp.float32)

    initd, pushd = streaming_fn_dynamic(cfg, frames_per_push=K)
    for seed in (0, 4):           # second params reuse the same jit cache
        params = init_params(jax.random.PRNGKey(seed), cfg)
        initb, pushb = streaming_fn(params, cfg, frames_per_push=K)
        cb = initb(B, spk, key)
        cd = initd(params, B, spk, key)
        for c in range(total // K):
            chunk = cond[:, c * K:(c + 1) * K]
            cb, audio_b, sb = pushb(cb, chunk)
            cd, audio_d, sd = pushd(params, cd, chunk)
            np.testing.assert_array_equal(np.asarray(sd), np.asarray(sb))
            np.testing.assert_allclose(np.asarray(audio_d),
                                       np.asarray(audio_b))
    # one compile served both param sets. _cache_size is a private jitted-
    # function API; if a JAX upgrade removes it, the equivalence checks
    # above still gate the feature — only this stricter assertion degrades.
    if hasattr(pushd, "_cache_size"):
        assert pushd._cache_size() == 1
