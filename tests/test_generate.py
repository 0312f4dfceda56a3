"""Generation: the nested-scan generator must be distribution-identical to
the training predictor (teacher-forcing equivalence — the strongest internal
consistency gate), plus sampling-path sanity and WAV output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.generate import (fused_embed_conv, generate_fn,
                                      teacher_forced_log_probs)
from msnv_tpu.models.samplernn import (init_params, init_tier_state,
                                       predictor_apply, sample_mlp_forward)
from msnv_tpu.ops.quantize import q_zero


def setup(cfg, batch=2, frames=3, seed=0):
    params = init_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    cond = jnp.asarray(rng.rand(batch, frames, cfg.effective_cond_dim),
                       jnp.float32)
    spk = jnp.asarray(rng.randint(0, cfg.spk_dim, (batch,)), jnp.int32)
    return params, cond, spk


@pytest.mark.parametrize("frame_sizes,n_rnn", [((4, 4), 1), ((20, 4), 2),
                                               ((4, 5, 4), 1)])
def test_teacher_forcing_matches_predictor(frame_sizes, n_rnn):
    cfg = ModelConfig(frame_sizes=frame_sizes, n_rnn=n_rnn, dim=24,
                      cond_dim=5, spk_dim=3)
    batch, frames = 2, 3
    params, cond, spk = setup(cfg, batch, frames)
    T = frames * cfg.lookback

    rng = np.random.RandomState(1)
    forced = jnp.asarray(rng.randint(0, cfg.q_levels, (batch, T)), jnp.int32)

    # generation machinery, teacher-forced
    tf = teacher_forced_log_probs(params, cfg)
    lp_gen = tf(cond, spk, forced)

    # predictor on [q_zero seed ‖ forced]
    seed_buf = jnp.full((batch, cfg.lookback), q_zero(cfg.q_levels),
                        jnp.int32)
    full = jnp.concatenate([seed_buf, forced], axis=1)
    lp_pred, _, _ = predictor_apply(params, cfg, full[:, :-1],
                                    jnp.asarray(True), cond, spk,
                                    init_tier_state(cfg, batch))

    np.testing.assert_allclose(np.asarray(lp_gen), np.asarray(lp_pred),
                               atol=3e-5)


def test_fused_table_equals_embed_conv():
    cfg = ModelConfig(frame_sizes=(4, 4), dim=16, cond_dim=3, spk_dim=1)
    params = init_params(jax.random.PRNGKey(0), cfg)
    fs0 = cfg.frame_sizes[0]
    rng = np.random.RandomState(0)
    samples = jnp.asarray(rng.randint(0, 256, (2, fs0)), jnp.int32)
    upper = jnp.zeros((2, 1, cfg.dim))
    # full-chunk path on a single window
    lp = sample_mlp_forward(params["mlp"], cfg, samples, upper)
    # fused-gather path
    T = fused_embed_conv(params["mlp"])
    x = jnp.zeros((2, cfg.dim))
    for p in range(fs0):
        x = x + T[p][samples[:, p]]
    x = jax.nn.relu(x)
    from msnv_tpu.ops.linear import dense_apply
    x = jax.nn.relu(dense_apply(params["mlp"]["hidden"], x))
    logits = dense_apply(params["mlp"]["out"], x)
    lp2 = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lp[:, 0]), np.asarray(lp2),
                               atol=2e-5)


def test_generate_shapes_and_sanity():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=24, cond_dim=5,
                      spk_dim=2)
    params, cond, spk = setup(cfg, batch=3, frames=4)
    gen = generate_fn(params, cfg)
    audio, seq = gen(cond, spk, jax.random.PRNGKey(42))
    T = 4 * cfg.lookback
    assert audio.shape == (3, T)
    assert seq.shape == (3, T)
    s = np.asarray(seq)
    assert s.min() >= 0 and s.max() < cfg.q_levels
    a = np.asarray(audio)
    assert np.isfinite(a).all()
    assert np.abs(a).max() <= 1.0
    # different keys -> different sample paths
    audio2, seq2 = gen(cond, spk, jax.random.PRNGKey(7))
    assert not np.array_equal(np.asarray(seq2), s)
    # same key -> deterministic
    audio3, seq3 = gen(cond, spk, jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(seq3), s)


def test_generate_output_length_ignores_sample_length_quirk():
    # parity with ref model.py:455: output length is num_cond_frames*lookback
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=3,
                      spk_dim=1)
    params, cond, spk = setup(cfg, batch=1, frames=5)
    gen = generate_fn(params, cfg)
    audio, _ = gen(cond, spk, jax.random.PRNGKey(0))
    assert audio.shape[1] == 5 * cfg.lookback


def test_generate_wav_roundtrip(tmp_path):
    from msnv_tpu.data.wavio import write_wav, read_wav
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=3,
                      spk_dim=1)
    params, cond, spk = setup(cfg, batch=1, frames=2)
    gen = generate_fn(params, cfg)
    audio, _ = gen(cond, spk, jax.random.PRNGKey(0))
    p = str(tmp_path / "gen.wav")
    write_wav(p, np.asarray(audio[0]), 16000)
    back, sr = read_wav(p)
    assert sr == 16000 and back.shape[0] == audio.shape[1]


def test_unrolled_scan_matches_rolled():
    # unroll is a pure scheduling knob: results must be bit-identical
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params, cond, spk = setup(cfg, batch=2, frames=3)
    g1 = generate_fn(params, cfg)
    g4 = generate_fn(params, cfg, unroll=4)
    _, s1 = g1(cond, spk, jax.random.PRNGKey(9))
    _, s4 = g4(cond, spk, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s4))


def test_temperature_one_is_default_path():
    """temperature=1.0 must be bit-identical to the default (reference
    multinomial semantics unchanged)."""
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params, cond, spk = setup(cfg, batch=2, frames=3)
    _, s_def = generate_fn(params, cfg)(cond, spk, jax.random.PRNGKey(3))
    _, s_t1 = generate_fn(params, cfg, temperature=1.0)(
        cond, spk, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(s_def), np.asarray(s_t1))


def test_temperature_zero_is_greedy_and_key_independent():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params, cond, spk = setup(cfg, batch=2, frames=3)
    g = generate_fn(params, cfg, temperature=0.0)
    _, s_a = g(cond, spk, jax.random.PRNGKey(0))
    _, s_b = g(cond, spk, jax.random.PRNGKey(999))
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))


def test_temperature_limits_to_greedy():
    """T -> 0+ converges to the argmax path (logit gaps dwarf the gumbel
    noise)."""
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params, cond, spk = setup(cfg, batch=2, frames=3)
    _, s_greedy = generate_fn(params, cfg, temperature=0.0)(
        cond, spk, jax.random.PRNGKey(0))
    _, s_cold = generate_fn(params, cfg, temperature=1e-4)(
        cond, spk, jax.random.PRNGKey(0))
    agree = (np.asarray(s_greedy) == np.asarray(s_cold)).mean()
    assert agree > 0.99, agree


def test_temperature_changes_distribution():
    """A hot temperature must actually change the sampled paths."""
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params, cond, spk = setup(cfg, batch=2, frames=3)
    _, s1 = generate_fn(params, cfg)(cond, spk, jax.random.PRNGKey(5))
    _, s9 = generate_fn(params, cfg, temperature=4.0)(
        cond, spk, jax.random.PRNGKey(5))
    assert not np.array_equal(np.asarray(s1), np.asarray(s9))


def test_temperature_pallas_interpret_argmax_invariant():
    """argmax(logits/T) == argmax(logits): with zero gumbel noise the v1
    interpret kernel must emit identical samples for any T > 0 (the
    temperature enters the kernel as pre-scaled w_out/b_out)."""
    from msnv_tpu.models.generate import _pallas_window_sampler
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2, q_levels=16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    fused = fused_embed_conv(params["mlp"])
    outs = {}
    # patch BEFORE building: the sampler binds gumbel_noise at build time
    import msnv_tpu.pallas.sample_kernel as sk
    orig = sk.gumbel_noise
    sk.gumbel_noise = lambda key, shape: jnp.zeros(shape)  # argmax mode
    try:
        for T in (1.0, 0.37):
            run = _pallas_window_sampler(params, cfg, fused,
                                         {"interpret": True, "tile_b": 8},
                                         temperature=T)
            buf = jnp.full((8, cfg.lookback), q_zero(cfg.q_levels),
                           jnp.int32)
            hs = tuple(jnp.zeros((cfg.n_rnn, 8, cfg.dim))
                       for _ in cfg.frame_sizes)
            slots = 0.1 * jax.random.normal(
                jax.random.PRNGKey(1), (8, cfg.frame_sizes[0], cfg.dim))
            _, samples = run((buf, hs, jax.random.PRNGKey(2)), slots)
            outs[T] = np.asarray(samples)
    finally:
        sk.gumbel_noise = orig
    np.testing.assert_array_equal(outs[1.0], outs[0.37])


def test_temperature_pallas_rejects_zero():
    from msnv_tpu.models.generate import _pallas_window_sampler
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2, q_levels=16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    fused = fused_embed_conv(params["mlp"])
    with pytest.raises(ValueError):
        _pallas_window_sampler(params, cfg, fused, {"interpret": True},
                               temperature=0.0)


def test_temperature_streaming_matches_batch():
    """Streaming with a temperature reproduces batch generation with the
    same temperature and key (the exactness contract holds at any T)."""
    from msnv_tpu.models.generate import streaming_fn
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params, cond, spk = setup(cfg, batch=2, frames=3)
    key = jax.random.PRNGKey(11)
    _, s_batch = generate_fn(params, cfg, temperature=0.5)(cond, spk, key)
    init_state, push = streaming_fn(params, cfg, temperature=0.5)
    carry = init_state(2, spk, key)
    outs = []
    for j in range(cond.shape[1]):
        carry, _, s = push(carry, cond[:, j])
        outs.append(np.asarray(s))
    np.testing.assert_array_equal(np.concatenate(outs, axis=1),
                                  np.asarray(s_batch))


def test_temperature_rejects_negative_and_nan():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params, cond, spk = setup(cfg, batch=1, frames=2)
    for bad in (-0.5, float("nan"), float("inf")):
        with pytest.raises(ValueError):
            generate_fn(params, cfg, temperature=bad)
