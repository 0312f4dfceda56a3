"""AOT generation artifacts (msnv_tpu/export.py, msnv-export CLI).

The artifact must (a) reproduce the live generate_fn_dynamic outputs
exactly on the same platform, (b) round-trip its manifest, (c) reject
unknown buckets/magic, and (d) build straight from a checkpoint path via
the CLI (tag re-hydration, ref generate.py:126-129)."""

import json
import os
import struct

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from msnv_tpu.config import make_tag, preset  # noqa: E402
from msnv_tpu.export import (GenerationArtifact, MAGIC, load_artifact,  # noqa: E402
                             save_artifact)
from msnv_tpu.models.generate import generate_fn_dynamic  # noqa: E402
from msnv_tpu.models.samplernn import init_params  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = preset("tiny_unconditional")
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    return cfg, params


def _inputs(m, lanes, frames, seed=3):
    rng = np.random.RandomState(seed)
    cond = jnp.asarray(rng.rand(lanes, frames, m.effective_cond_dim),
                       jnp.float32)
    spk = jnp.asarray(rng.randint(0, m.spk_dim, (lanes,)), jnp.int32)
    return cond, spk


def test_artifact_matches_live_generation(tiny, tmp_path):
    cfg, params = tiny
    m = cfg.model
    path = os.path.join(tmp_path, "tiny.msnvx")
    manifest = save_artifact(path, cfg, [(2, 3), (1, 2)], params=params)
    assert manifest["tag"] == make_tag(cfg)
    assert [tuple(b) for b in
            [(e["lanes"], e["frames"]) for e in manifest["buckets"]]] \
        == [(2, 3), (1, 2)]

    art = load_artifact(path)
    assert art.buckets == [(1, 2), (2, 3)]
    live = generate_fn_dynamic(m)
    for lanes, frames in art.buckets:
        cond, spk = _inputs(m, lanes, frames)
        key = jax.random.PRNGKey(11)
        audio_a, seq_a = art.call(params, cond, spk, key)
        audio_l, seq_l = live(params, cond, spk, key)
        assert jnp.array_equal(seq_a, seq_l)
        assert jnp.array_equal(audio_a, audio_l)


def test_artifact_params_are_call_time(tiny, tmp_path):
    """Same artifact, different weights -> different (correct) output."""
    cfg, params = tiny
    m = cfg.model
    path = os.path.join(tmp_path, "p.msnvx")
    save_artifact(path, cfg, [(1, 2)], params=params)
    art = load_artifact(path)
    params2 = init_params(jax.random.PRNGKey(9), m)
    cond, spk = _inputs(m, 1, 2)
    key = jax.random.PRNGKey(5)
    _, seq1 = art.call(params, cond, spk, key)
    _, seq2 = art.call(params2, cond, spk, key)
    live = generate_fn_dynamic(m)
    _, seq2_live = live(params2, cond, spk, key)
    assert jnp.array_equal(seq2, seq2_live)
    assert not jnp.array_equal(seq1, seq2)


def test_artifact_rejects_unknown_bucket_and_bad_magic(tiny, tmp_path):
    cfg, params = tiny
    path = os.path.join(tmp_path, "b.msnvx")
    save_artifact(path, cfg, [(1, 2)], params=params)
    art = load_artifact(path)
    cond, spk = _inputs(cfg.model, 2, 2)
    with pytest.raises(KeyError, match="no bucket"):
        art.call(params, cond, spk, jax.random.PRNGKey(0))

    bad = os.path.join(tmp_path, "bad.msnvx")
    with open(bad, "wb") as f:
        f.write(b"NOTMAGIC" + struct.pack("<I", 2) + b"{}")
    with pytest.raises(ValueError, match="not an msnv export artifact"):
        load_artifact(bad)


def test_spk_mix_artifact(tiny, tmp_path):
    """Eigen-voice ABI: float embedding weights instead of ids."""
    cfg, params = tiny
    m = cfg.model
    path = os.path.join(tmp_path, "mix.msnvx")
    save_artifact(path, cfg, [(1, 2)], params=params, spk_mix=True)
    art = load_artifact(path)
    assert art.manifest["spk_mix"] is True
    cond, _ = _inputs(m, 1, 2)
    mix = jnp.ones((1, m.spk_dim), jnp.float32) / m.spk_dim
    key = jax.random.PRNGKey(2)
    audio_a, seq_a = art.call(params, cond, mix, key)
    audio_l, seq_l = generate_fn_dynamic(m)(params, cond, mix, key)
    assert jnp.array_equal(seq_a, seq_l)


@pytest.fixture()
def tiny_checkpoint(tiny, tmp_path):
    """A checkpoint laid out the reference way: results/<tag>/checkpoints/
    <ckpt> (the tag is the config store, ref generate.py:126-129)."""
    cfg, params = tiny
    from msnv_tpu.training.checkpoint import save_checkpoint
    ckpt_dir = os.path.join(tmp_path, "results", make_tag(cfg),
                            "checkpoints")
    os.makedirs(ckpt_dir)
    path = os.path.join(ckpt_dir, "best-ep1-it1.npz")
    save_checkpoint(path, {"params": params})
    return path


def test_export_cli(tiny_checkpoint, tmp_path):
    """msnv-export end to end from a real checkpoint path."""
    model_path = tiny_checkpoint
    out = os.path.join(tmp_path, "cli.msnvx")
    from msnv_tpu.cli.export import main as export_main
    # default --frame_bucket 16 rounds frames up to serving's padding
    # geometry; --frame_bucket 1 keeps the exact count
    export_main(["--model", model_path, "--out", out + ".b16",
                 "--lanes", "1", "--frames", "2"])
    assert load_artifact(out + ".b16").buckets == [(1, 16)]
    export_main(["--model", model_path, "--out", out,
                 "--lanes", "1,2", "--frames", "2", "--frame_bucket", "1"])
    art = load_artifact(out)
    assert art.buckets == [(1, 2), (2, 2)]
    with open(out, "rb") as f:
        assert f.read(len(MAGIC)) == MAGIC
    # run it
    from msnv_tpu.config import parse_tag, tag_from_checkpoint_path
    from msnv_tpu.training.checkpoint import load_any
    cfg = parse_tag(tag_from_checkpoint_path(model_path))
    m = cfg.model
    params = init_params(jax.random.PRNGKey(0), m)
    state, _ = load_any(model_path, {"params": params})
    params = state["params"] if "params" in state else state
    cond, spk = _inputs(m, 2, 2)
    audio, seq = art.call(params, cond, spk, jax.random.PRNGKey(1))
    assert np.asarray(audio).shape == (2, 2 * m.lookback)
    assert np.isfinite(np.asarray(audio)).all()


def test_stream_artifact_matches_live(tiny, tmp_path):
    """Exported streaming init+push executables reproduce the live
    streaming_fn sample-exactly, including a K-push followed by 1-frame
    pushes on the SAME carry (the serving trailing-frames path)."""
    from msnv_tpu.models.generate import streaming_fn

    cfg, params = tiny
    m = cfg.model
    path = os.path.join(tmp_path, "s.msnvx")
    manifest = save_artifact(path, cfg, [], params=params,
                             stream_buckets=[(1, 1), (1, 2)])
    assert [(e["lanes"], e["frames_per_push"]) for e in
            manifest["streams"]] == [(1, 1), (1, 2)]
    art = load_artifact(path)
    assert art.stream_buckets == [(1, 1), (1, 2)]

    rng = np.random.RandomState(0)
    frames = 5
    cond = jnp.asarray(rng.rand(1, frames, m.effective_cond_dim),
                       jnp.float32)
    spk = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(4)

    # live reference: K=2 pushes then a 1-frame tail
    li2, lp2 = streaming_fn(params, m, frames_per_push=2)
    _, lp1 = streaming_fn(params, m, frames_per_push=1)
    carry = li2(1, spk, key)
    live = []
    for s in range(0, 4, 2):
        carry, _, smp = lp2(carry, cond[:, s:s + 2])
        live.append(np.asarray(smp))
    carry, _, smp = lp1(carry, cond[:, 4])
    live.append(np.asarray(smp))

    ai2, ap2 = art.streaming(2)
    _, ap1 = art.streaming(1)
    carry = ai2(params, spk, key)
    got = []
    for s in range(0, 4, 2):
        carry, _, smp = ap2(params, carry, cond[:, s:s + 2])
        got.append(np.asarray(smp))
    carry, _, smp = ap1(params, carry, cond[:, 4])
    got.append(np.asarray(smp))

    for a, b in zip(got, live):
        np.testing.assert_array_equal(a, b)

    with pytest.raises(KeyError, match="no stream bucket"):
        art.streaming(7)


def test_export_cli_stream(tiny_checkpoint, tmp_path):
    out = os.path.join(tmp_path, "cs.msnvx")
    from msnv_tpu.cli.export import main as export_main
    export_main(["--model", tiny_checkpoint, "--out", out,
                 "--lanes", "1", "--frames", "2", "--frame_bucket", "1",
                 "--stream", "1,2"])
    art = load_artifact(out)
    assert art.stream_buckets == [(1, 1), (1, 2)]
    assert art.buckets == [(1, 2)]
