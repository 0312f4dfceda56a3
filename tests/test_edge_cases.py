"""Edge cases: stereo downmix, degenerate interpolation inputs, streaming
with the pallas kernel, single-frame generation."""

import struct

import numpy as np

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.data.wavio import read_wav
from msnv_tpu.models.generate import generate_fn, streaming_fn
from msnv_tpu.models.samplernn import init_params
from msnv_tpu.ops.interpolate import interpolation


def write_stereo_pcm16(path, left, right, sr):
    inter = np.empty(left.size * 2, dtype="<i2")
    inter[0::2] = (left * 32768).astype("<i2")
    inter[1::2] = (right * 32768).astype("<i2")
    payload = inter.tobytes()
    with open(path, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", 36 + len(payload), b"WAVE"))
        f.write(struct.pack("<4sI", b"fmt ", 16))
        f.write(struct.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16))
        f.write(struct.pack("<4sI", b"data", len(payload)))
        f.write(payload)


def test_stereo_downmix(tmp_path):
    rng = np.random.RandomState(0)
    left = rng.rand(800).astype(np.float32) * 0.5
    right = rng.rand(800).astype(np.float32) * 0.5
    p = str(tmp_path / "st.wav")
    write_stereo_pcm16(p, left, right, 16000)
    x, sr = read_wav(p)
    assert sr == 16000 and x.shape == (800,)
    # librosa mono=True semantics: mean over channels
    expected = ((left * 32768).astype(np.int16) / 32768.0
                + (right * 32768).astype(np.int16) / 32768.0) / 2
    np.testing.assert_allclose(x, expected, atol=1e-6)
    # native path parity
    from msnv_tpu.data import native
    if native.available():
        xn, srn = native.read_wav(p)
        np.testing.assert_allclose(xn, x, atol=1e-6)


def test_interpolation_tiny_signals():
    sig, uv = interpolation(np.array([5.0]), -1e10)
    assert sig.shape == (1,) and uv.tolist() == [1]
    sig, uv = interpolation(np.array([-1e11]), -1e10)
    assert uv.tolist() == [1]  # all-unvoiced quirk: mask stays ones
    sig, uv = interpolation(np.array([-1e11, 3.0]), -1e10)
    np.testing.assert_allclose(sig, [3.0, 3.0])
    assert uv.tolist() == [0, 1]


def test_streaming_with_pallas():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    init_state, push = streaming_fn(
        params, cfg, use_pallas=True,
        pallas_opts={"interpret": True, "tile_b": 2})
    carry = init_state(2, jnp.asarray([0, 1], jnp.int32),
                       jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    for _ in range(3):
        carry, audio, samples = push(
            carry, jnp.asarray(rng.rand(2, 5), jnp.float32))
    s = np.asarray(samples)
    assert s.shape == (2, cfg.lookback)
    assert s.min() >= 0 and s.max() < 256


def test_single_frame_generation():
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=1)
    params = init_params(jax.random.PRNGKey(0), cfg)
    cond = jnp.asarray(np.random.RandomState(0).rand(1, 1, 5), jnp.float32)
    audio, seq = generate_fn(params, cfg)(
        cond, jnp.asarray([0], jnp.int32), jax.random.PRNGKey(0))
    assert audio.shape == (1, cfg.lookback)
