"""Cross-variant checkpoint round-trip guarantees (VERDICT r1 item 6).

For every BASELINE preset (all three conditioner variants, weight-norm,
look-ahead, 3-tier) x both backends {npz, orbax}: save -> load must be
BIT-exact on the full trainer state pytree (params + Adam moments + TBPTT
hidden [+ GAN discriminator & its optimizer]), with meta round-tripping.
And per variant: a restore into a fresh trainer must continue training
exactly like the uninterrupted run (ref plugins.py:113-155 +
train.py:110-126 semantics, exceeded: the reference only saves params).
"""

import dataclasses
import os

import numpy as np
import pytest

import jax

from msnv_tpu.config import (ExperimentConfig, ModelConfig, PRESETS,
                             TrainConfig, preset)
from msnv_tpu.models.discriminator import discriminator_init
from msnv_tpu.models.samplernn import init_params, init_tier_state
from msnv_tpu.training.checkpoint import (load_any, save_checkpoint,
                                          save_checkpoint_orbax)
from msnv_tpu.training.optim import make_optimizer


def _shrunk(cfg: ExperimentConfig) -> ExperimentConfig:
    """Same structure (variant head, weight_norm, look-ahead, tier count),
    CPU-test dims: the round-trip property is about pytree fidelity per
    variant/backend, not about width."""
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dim=48))


def _full_state(cfg: ExperimentConfig, seed: int):
    m = cfg.model
    params = init_params(jax.random.PRNGKey(seed), m)
    opt = make_optimizer(cfg.train)
    state = {
        "params": params,
        "opt_state": opt.init(params),
        "tier_state": init_tier_state(m, 4),
    }
    if m.variant == "gan":
        disc = discriminator_init(jax.random.PRNGKey(seed + 1), m.spk_dim,
                                  channels=16)
        state["disc_params"] = disc
        state["disc_opt_state"] = opt.init(disc)
    return state


@pytest.mark.parametrize("backend", ["npz", "orbax"])
@pytest.mark.parametrize("name", PRESETS)
def test_preset_roundtrip_bitexact(name, backend, tmp_path):
    cfg = _shrunk(preset(name))
    state = _full_state(cfg, seed=3)
    meta = {"epoch": 7, "iteration": 123, "chunk": 5, "val_loss": 1.25}
    path = str(tmp_path / ("ck.npz" if backend == "npz" else "ck.orbax"))
    if backend == "npz":
        save_checkpoint(path, state, meta)
    else:
        save_checkpoint_orbax(path, state, meta)

    # template from a DIFFERENT seed: loaded values must come from disk
    template = _full_state(cfg, seed=9)
    loaded, got_meta = load_any(path, template)
    assert {k: got_meta[k] for k in meta} == meta

    flat_a, tree_a = jax.tree_util.tree_flatten(state)
    flat_b, tree_b = jax.tree_util.tree_flatten(loaded)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def roundtrip_corpus(tmp_path_factory):
    from msnv_tpu.data.corpus import CorpusConfig, build_corpus
    from msnv_tpu.data.loader import ChunkLoader
    from msnv_tpu.data.synthetic import make_synthetic_corpus

    root = str(tmp_path_factory.mktemp("rt_corpus"))
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=150, cond_len=16,
                          partitions=("train",))
    ccfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"), overlap_len=16, seq_len=64,
        batch_size=4, cond_len=16, norm_ind=False,
        cache_dir=os.path.join(root, "npy"))
    return ChunkLoader(build_corpus(ccfg, "train"), 64, 16, 16)


@pytest.mark.parametrize("variant", ["identity", "bottleneck", "gan"])
def test_resume_equals_uninterrupted(variant, roundtrip_corpus, tmp_path):
    """save after epoch 1 -> restore into a FRESH trainer -> epoch 2
    reproduces the uninterrupted run, for every conditioner variant
    (the GAN head carries discriminator + second optimizer state)."""
    from msnv_tpu.training.trainer import Trainer

    loader = roundtrip_corpus
    cfg = ExperimentConfig(
        exp=f"rt-{variant}",
        model=ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=24, cond_dim=43,
                          cond_len=16, spk_dim=2, variant=variant,
                          ind_cond_dim=6),
        train=TrainConfig(seq_len=64, batch_size=4, learning_rate=1e-3,
                          lambda_weight=(0.0, 0.01, 10.0)))

    def fresh(seed):
        t = Trainer(cfg, init_params(jax.random.PRNGKey(seed), cfg.model),
                    make_optimizer(cfg.train), loader)
        if variant == "gan":
            t.disc_params = discriminator_init(jax.random.PRNGKey(9), 2,
                                               channels=8)
            t.disc_opt_state = t.disc_opt.init(t.disc_params)
        return t

    t1 = fresh(seed=1)
    t1.run(1)
    path = str(tmp_path / f"{variant}.npz")
    save_checkpoint(path, t1.checkpoint_state(),
                    {"epoch": t1.epochs, "iteration": t1.iterations})
    t1.run(2)

    t2 = fresh(seed=2)   # different init, fully overwritten by restore
    state, meta = load_any(path, t2.checkpoint_state())
    t2.restore(state, meta)
    t2.run(2)

    assert t1.iterations == t2.iterations
    for a, b in zip(jax.tree_util.tree_leaves(t1.checkpoint_state()),
                    jax.tree_util.tree_leaves(t2.checkpoint_state())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    if variant == "gan":
        assert t1.stats["lambda"]["last"] == t2.stats["lambda"]["last"]
