"""Exposure-bias mitigation (round 5, VERDICT r04 #4): scheduled
sampling + input-noise as train-step options.

The reference has no such mechanism (its thesis only documents the
failure mode — saturation bursts, doc/Barbany_report.pdf §4.3); these
are training-loop-only additions: targets stay clean, eval/generation
untouched.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msnv_tpu.config import (DataConfig, ExperimentConfig, ModelConfig,
                             TrainConfig, make_tag, parse_tag)
from msnv_tpu.models.samplernn import init_params, init_tier_state
from msnv_tpu.training.optim import make_optimizer
from msnv_tpu.training.step import (exposure_tuple, make_train_block_scan,
                                    make_train_step,
                                    make_train_step_indexed)

CFG = ModelConfig(frame_sizes=(2, 2), n_rnn=1, dim=16, cond_dim=3,
                  cond_len=4, spk_dim=2)
TRAIN = TrainConfig(seq_len=32, batch_size=4, learning_rate=1e-3)


def _batch(b=4, seed=0):
    rng = np.random.RandomState(seed)
    data = jnp.asarray(rng.randint(0, 256, (b, TRAIN.seq_len
                                            + CFG.lookback - 1)), jnp.int32)
    target = jnp.asarray(rng.randint(0, 256, (b, TRAIN.seq_len)), jnp.int32)
    cond = jnp.asarray(rng.rand(b, TRAIN.seq_len // CFG.lookback,
                                CFG.effective_cond_dim), jnp.float32)
    spk = jnp.asarray(rng.randint(0, CFG.spk_dim, (b,)), jnp.int32)
    return data, target, cond, spk


def test_exposure_tuple_gating():
    assert exposure_tuple(TRAIN) is None
    assert exposure_tuple(None) is None
    et = exposure_tuple(TrainConfig(ss_prob=0.3))
    assert et == (0.3, 0.0, 8)
    et = exposure_tuple(TrainConfig(input_noise_prob=0.1,
                                    input_noise_levels=4))
    assert et == (0.0, 0.1, 4)


@pytest.mark.parametrize("exposure", [(0.5, 0.0, 8), (0.0, 0.25, 4),
                                      (0.5, 0.25, 4)])
def test_exposure_step_runs_and_is_key_deterministic(exposure):
    params = init_params(jax.random.PRNGKey(0), CFG)
    opt = make_optimizer(TRAIN)
    data, target, cond, spk = _batch()
    step = make_train_step(CFG, opt, donate=False, exposure=exposure)
    key = jax.random.PRNGKey(7)
    state = init_tier_state(CFG, 4)
    p1, _, _, l1 = step(params, opt.init(params), state, data,
                        jnp.asarray(True), target, cond, spk, key)
    p2, _, _, l2 = step(params, opt.init(params), state, data,
                        jnp.asarray(True), target, cond, spk, key)
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)          # same key -> same perturbation
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, _, _, l3 = step(params, opt.init(params), state, data,
                       jnp.asarray(True), target, cond, spk,
                       jax.random.PRNGKey(8))
    assert float(l3) != float(l1)          # fresh key -> fresh perturbation
    # and the perturbed step differs from the clean baseline
    clean = make_train_step(CFG, opt, donate=False)
    _, _, _, l0 = clean(params, opt.init(params), state, data,
                        jnp.asarray(True), target, cond, spk)
    assert float(l0) != float(l1)


def test_indexed_and_block_scan_match_with_exposure():
    """The indexed step and the block scan fold the chunk index into the
    same base key — N indexed steps must equal one N-chunk scan."""
    params = init_params(jax.random.PRNGKey(1), CFG)
    opt = make_optimizer(TRAIN)
    b, n_chunks = 4, 3
    cis = TRAIN.seq_len // CFG.lookback
    lane_len = n_chunks * TRAIN.seq_len + TRAIN.seq_len + CFG.lookback
    rng = np.random.RandomState(2)
    corpus = {
        "qdata": jnp.asarray(rng.randint(0, 256, (b, lane_len)), jnp.int32),
        "cond": jnp.asarray(rng.rand(b, (n_chunks + 2) * cis,
                                     CFG.effective_cond_dim), jnp.float32),
        "spk": jnp.asarray(rng.randint(0, CFG.spk_dim, (n_chunks, b)),
                           jnp.int32),
    }
    exposure = (0.4, 0.1, 8)
    geo = (TRAIN.seq_len, CFG.lookback, cis)
    step_i = make_train_step_indexed(CFG, opt, *geo, donate=False,
                                     exposure=exposure)
    scan = make_train_block_scan(CFG, opt, *geo, donate=False,
                                 exposure=exposure)
    key = jax.random.PRNGKey(3)
    state = init_tier_state(CFG, b)
    p_a, o_a, s_a = params, opt.init(params), state
    losses_a = []
    for k in range(n_chunks):
        p_a, o_a, s_a, loss = step_i(p_a, o_a, s_a, corpus, np.int32(k),
                                     key)
        losses_a.append(float(loss))
    p_b, o_b, s_b, losses_b = scan(params, opt.init(params), state, corpus,
                                   jnp.arange(n_chunks, dtype=jnp.int32),
                                   key)
    np.testing.assert_allclose(losses_a, np.asarray(losses_b), atol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_trainer_integration_and_gan_rejection(tmp_path):
    import os

    from msnv_tpu.data.corpus import CorpusConfig, build_corpus
    from msnv_tpu.data.loader import ChunkLoader
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    from msnv_tpu.training.trainer import Trainer

    root = str(tmp_path / "corpus")
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=80, cond_len=16,
                          partitions=("train",))
    ccfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"),
        overlap_len=16, seq_len=64, batch_size=2, cond_len=16,
        norm_ind=False, cache_dir=os.path.join(root, "npy"))
    loader = ChunkLoader(build_corpus(ccfg, "train"), seq_len=64,
                         overlap_len=16, cond_len=16)
    model = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=43,
                        cond_len=16, spk_dim=2)
    ecfg = ExperimentConfig(
        exp="exposure", model=model,
        train=TrainConfig(seq_len=64, batch_size=2, learning_rate=1e-3,
                          ss_prob=0.3, input_noise_prob=0.1),
        data=DataConfig(results_path=str(tmp_path)))
    opt = make_optimizer(ecfg.train)
    trainer = Trainer(ecfg, init_params(jax.random.PRNGKey(0), model), opt,
                      loader)
    trainer.train_epoch()
    assert trainer.iterations == len(loader)
    # GAN + exposure is an explicit error, not silent ignoring
    gcfg = ExperimentConfig(
        exp="exposure_gan",
        model=ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=43,
                          cond_len=16, spk_dim=2, variant="gan",
                          ind_cond_dim=4),
        train=TrainConfig(seq_len=64, batch_size=2, ss_prob=0.3,
                          disc_channels=4),
        data=DataConfig(results_path=str(tmp_path)))
    with pytest.raises(ValueError, match="GAN"):
        Trainer(gcfg, init_params(jax.random.PRNGKey(0), gcfg.model),
                make_optimizer(gcfg.train), loader)


def test_tag_roundtrip_with_exposure():
    cfg = ExperimentConfig(
        exp="ss", model=CFG,
        train=TrainConfig(ss_prob=0.25, input_noise_prob=0.05))
    tag = make_tag(cfg)
    assert "ss_prob:0.25" in tag and "input_noise:0.05" in tag
    back = parse_tag(tag, exp="ss")
    assert back.train.ss_prob == 0.25
    assert back.train.input_noise_prob == 0.05
    # defaults stay out of the tag
    assert "ss_prob" not in make_tag(ExperimentConfig(exp="ss", model=CFG))
