"""Regression tests for the round-1 code-review findings."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig, TrainConfig
from msnv_tpu.models.generate import generate_fn
from msnv_tpu.models.samplernn import init_params, init_tier_state
from msnv_tpu.training.checkpoint import (CheckpointManager, load_checkpoint,
                                          save_checkpoint)
from msnv_tpu.training.optim import make_optimizer
from msnv_tpu.training.step import make_train_step


def test_pallas_batch_not_tile_multiple():
    """Batches that don't divide by tile_b are padded, not crashed
    (review finding 1/3): v1 path with batch 5, tile 2."""
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # sharpen: categorical == argmax, so results are noise-independent and
    # comparable against the XLA path
    out = params["mlp"]["out"]
    params["mlp"]["out"] = {"w": out["w"] * 1e6, "b": out["b"] * 1e6}
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.rand(5, 2, 5), jnp.float32)
    spk = jnp.asarray(rng.randint(0, 2, (5,)), jnp.int32)
    gen = generate_fn(params, cfg, use_pallas=True,
                      pallas_opts={"interpret": True, "tile_b": 2})
    audio, seq = gen(cond, spk, jax.random.PRNGKey(0))
    assert seq.shape == (5, 2 * cfg.lookback)
    s = np.asarray(seq)
    assert s.min() >= 0 and s.max() < 256
    # padded lanes must not perturb real lanes: equals the XLA path
    _, seq_x = generate_fn(params, cfg)(cond, spk, jax.random.PRNGKey(0))
    assert np.mean(s != np.asarray(seq_x)) < 0.02


def test_learn_h0_false_freezes_h0():
    """learn_h0=False keeps h0 at zero through training (finding 4)."""
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                      spk_dim=2, learn_h0=False)
    tc = TrainConfig(seq_len=32, batch_size=2, learning_rate=1e-2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tc)
    opt_state = opt.init(params)
    state = init_tier_state(cfg, 2)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(0, 256, (2, 32 + cfg.lookback - 1)),
                       jnp.int32)
    target = jnp.asarray(rng.randint(0, 256, (2, 32)), jnp.int32)
    cond = jnp.asarray(rng.rand(2, 2, 5), jnp.float32)
    spk = jnp.asarray([0, 1], jnp.int32)
    step = make_train_step(cfg, opt, donate=False)
    for k in range(3):
        params, opt_state, state, _ = step(
            params, opt_state, state, data, jnp.asarray(k == 0), target,
            cond, spk)
    for tier in params["tiers"]:
        np.testing.assert_array_equal(np.asarray(tier["h0"]), 0.0)
    # other params did move
    assert float(jnp.abs(params["mlp"]["hidden"]["w"]).sum()) > 0


def test_best_loss_survives_manager_restart(tmp_path):
    """A resumed CheckpointManager must not overwrite a better past best
    (finding 5)."""
    state = {"w": jnp.ones(3)}
    m1 = CheckpointManager(str(tmp_path))
    m1.save_epoch(state, 1, 10, val_loss=1.2)
    # restart (fresh manager over the same dir), worse val loss
    m2 = CheckpointManager(str(tmp_path))
    m2.save_epoch(state, 2, 20, val_loss=1.5)
    best = m2.best()
    assert best is not None
    assert best[1] == 1, "best-ep1 must survive the worse post-restart epoch"
    # a genuinely better loss still updates
    m2.save_epoch(state, 3, 30, val_loss=1.0)
    assert m2.best()[1] == 3


def test_load_checkpoint_shape_mismatch_names_path(tmp_path):
    """Shape mismatches fail at load time with the pytree path
    (finding 7)."""
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, {"params": {"w": jnp.ones((3, 4))}})
    with pytest.raises(ValueError, match=r"shape mismatch.*w"):
        load_checkpoint(path, {"params": {"w": jnp.ones((3, 5))}})


def test_warm_start_params_only(tmp_path):
    """cli.train --model restores weights but not optimizer/hidden state
    (finding 2): different batch size must work."""
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    from msnv_tpu.cli.train import main as train_main

    root = str(tmp_path)
    data_dir = os.path.join(root, "d")
    os.makedirs(data_dir)
    make_synthetic_corpus(data_dir, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=150, cond_len=16)
    results = os.path.join(root, "r")
    common = ["--frame_sizes", "4", "4", "--n_rnn", "1", "--dim", "16",
              "--seq_len", "64", "--cond_len", "16", "--norm_ind", "false",
              "--datasets_path", data_dir, "--results_path", results,
              "--epoch_limit", "1", "--learning_rate", "1e-3"]
    cwd = os.getcwd()
    os.chdir(root)
    try:
        train_main(["--exp", "a", "--batch_size", "4"] + common)
        exp_a = [d for d in os.listdir(results) if "exp:a" in d][0]
        ck = [c for c in os.listdir(os.path.join(results, exp_a,
                                                 "checkpoints"))
              if c.startswith("ep")][0]
        # warm start at a DIFFERENT batch size: params-only restore
        train_main(["--exp", "b", "--batch_size", "2", "--model",
                    os.path.join(results, exp_a, "checkpoints", ck)]
                   + common)
        exp_b = [d for d in os.listdir(results) if "exp:b" in d][0]
        assert os.path.isdir(os.path.join(results, exp_b, "checkpoints"))
    finally:
        os.chdir(cwd)
