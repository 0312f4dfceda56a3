"""Real-TPU on-chip tests (opt-in: pytest -m tpu --override-ini addopts=).

These run against the actual chip (the axon platform): the Pallas kernel
compiled for real, and a tiny generation consistency check.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu():
    # undo the conftest CPU override inside this module's process? The
    # platform was fixed at backend init; these tests are meant for a
    # separate invocation:
    #   JAX_PLATFORMS=axon python -m pytest tests/test_tpu_onchip.py -m tpu \
    #       -p no:cacheprovider --override-ini addopts= --noconftest
    import jax
    if jax.devices()[0].platform == "cpu":
        pytest.skip("not running on TPU (use --noconftest + -m tpu)")
    return jax


def test_pallas_kernel_on_chip(tpu):
    import jax
    import jax.numpy as jnp
    from msnv_tpu.config import ModelConfig
    from msnv_tpu.models.generate import fused_embed_conv, _mlp_logits
    from msnv_tpu.models.samplernn import init_params
    from msnv_tpu.ops.linear import dense_weight
    from msnv_tpu.pallas.sample_kernel import make_sample_window

    cfg = ModelConfig(frame_sizes=(20, 4), n_rnn=1, dim=256, cond_dim=5,
                      spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    fused = fused_embed_conv(params["mlp"]).astype(jnp.bfloat16)
    fs0, q, dim = fused.shape
    batch = 64
    rng = np.random.RandomState(0)
    buf0 = jnp.asarray(rng.randint(0, q, (batch, fs0)), jnp.int32)
    slots = jnp.asarray(rng.randn(fs0, batch, dim), jnp.float32)
    noise = jnp.zeros((fs0, batch, q), jnp.float32)

    kern = make_sample_window(fs0, q, dim, batch, tile_b=64)
    out = kern(fused.reshape(fs0 * q, dim),
               dense_weight(params["mlp"]["hidden"]).T.astype(jnp.bfloat16),
               params["mlp"]["hidden"]["b"][None, :].astype(jnp.float32),
               dense_weight(params["mlp"]["out"]).T.astype(jnp.bfloat16),
               params["mlp"]["out"]["b"][None, :].astype(jnp.float32),
               slots.astype(jnp.bfloat16), buf0, noise)
    out = np.asarray(out)
    assert out.shape == (batch, fs0)
    assert out.min() >= 0 and out.max() < q

    # zero-noise argmax must match the XLA math (bf16 tolerance: compare
    # against bf16-cast XLA logits argmax; near-ties may differ)
    from msnv_tpu.models.generate import cast_float_tree
    params_bf = cast_float_tree(params, jnp.bfloat16)
    fused_bf = fused_embed_conv(params_bf["mlp"])
    buf = buf0
    match = 0
    import jax.numpy as jnp2
    for k in range(fs0):
        logits = _mlp_logits(params_bf, fused_bf, buf,
                             slots[k].astype(jnp.bfloat16))
        s = jnp2.argmax(logits, axis=-1).astype(jnp2.int32)
        match += int((np.asarray(s) == out[:, k]).sum())
        buf = jnp2.concatenate([buf[:, 1:], out[:, k][:, None]], axis=1)
    assert match / (batch * fs0) > 0.97, match / (batch * fs0)


def test_pallas_v3_matches_v1_on_chip(tpu):
    """v3 (streamed slot rows, in-kernel PRNG) == v1 (zero noise) under
    sharpened outputs — exact sample equality."""
    import jax
    import jax.numpy as jnp
    from msnv_tpu.config import ModelConfig
    from msnv_tpu.models.generate import fused_embed_conv
    from msnv_tpu.models.samplernn import init_params
    from msnv_tpu.ops.linear import dense_weight
    from msnv_tpu.pallas.sample_kernel import (make_sample_window,
                                               make_sample_window_v3)

    cfg = ModelConfig(frame_sizes=(20, 4), n_rnn=1, dim=256, cond_dim=5,
                      spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    out = params["mlp"]["out"]
    params["mlp"]["out"] = {"w": out["w"] * 1e6, "b": out["b"] * 1e6}
    fused = fused_embed_conv(params["mlp"])
    fs0, q, dim = fused.shape
    B, tb = 64, 32
    rng = np.random.RandomState(0)
    buf0 = jnp.asarray(rng.randint(0, q, (B, fs0)), jnp.int32)
    slots = jnp.asarray(rng.randn(fs0, B, dim), jnp.float32)
    table = fused.reshape(fs0 * q, dim)
    wh = dense_weight(params["mlp"]["hidden"]).T
    bh = params["mlp"]["hidden"]["b"][None, :]
    wo = dense_weight(params["mlp"]["out"]).T
    bo = params["mlp"]["out"]["b"][None, :]
    slots_tiled = slots.reshape(fs0, B // tb, tb, dim).transpose(1, 0, 2, 3)
    k3 = make_sample_window_v3(fs0, q, dim, B, tile_b=tb)
    out3 = np.asarray(k3(jnp.asarray([123], jnp.int32), table, wh, bh, wo,
                         bo, slots_tiled, buf0))
    k1 = make_sample_window(fs0, q, dim, B, tile_b=B)
    noise = jnp.zeros((fs0, B, q), jnp.float32)
    out1 = np.asarray(k1(table, wh, bh, wo, bo, slots, buf0, noise))
    assert (out3 == out1).mean() > 0.99


def test_small_batch_generation_on_chip(tpu):
    """Default (v2) AND v3 pallas generation at batches 1, 3 (below the
    8-sublane minimum) and 12 (between multiples of 8): the wrapper pads
    lanes up to a legal tile instead of handing Mosaic 1-2 lane blocks."""
    import jax
    import jax.numpy as jnp
    from msnv_tpu.config import ModelConfig
    from msnv_tpu.models.generate import generate_fn
    from msnv_tpu.models.samplernn import init_params

    cfg = ModelConfig(frame_sizes=(20, 4), n_rnn=1, dim=256, cond_dim=5,
                      spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    gen = generate_fn(params, cfg, compute_dtype=jnp.bfloat16,
                      use_pallas=True, pallas_opts={"v3": True})
    gen_v2 = generate_fn(params, cfg, compute_dtype=jnp.bfloat16,
                         use_pallas=True, pallas_opts={})
    rng = np.random.RandomState(0)
    for batch in (1, 3, 12):
        cond = jnp.asarray(rng.rand(batch, 2, cfg.effective_cond_dim),
                           jnp.float32)
        spk = jnp.asarray(rng.randint(0, cfg.spk_dim, (batch,)), jnp.int32)
        for g in (gen, gen_v2):
            audio, seq = g(cond, spk, jax.random.PRNGKey(1))
            assert seq.shape == (batch, 2 * cfg.lookback)
            assert int(seq.min()) >= 0 and int(seq.max()) < cfg.q_levels


def test_perf_floors_on_chip(tpu):
    """Loose perf-regression floors on the official bench (≥2x slack vs
    the recorded numbers in docs/VALIDATION.md: ~545 audio-s/s/chip
    generation, ~3.4M train samples/s). Catches silent order-of-magnitude
    regressions, not noise. Runs bench.main() IN-PROCESS: a subprocess
    could not acquire the chip on single-client TPU runtimes while this
    pytest process holds it."""
    import contextlib
    import importlib.util
    import io
    import json
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    spec = importlib.util.spec_from_file_location(
        "msnv_bench", os.path.join(repo, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    line = [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    assert r["value"] > 250.0, r            # audio-s/s/chip (recorded ~545)
    ex = r["extras"]
    assert ex["train_samples_per_s"] > 1.5e6, ex  # recorded ~3.4M
