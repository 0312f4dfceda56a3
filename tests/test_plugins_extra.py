"""GeneratorPlugin + TensorBoardPlugin wiring tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msnv_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
from msnv_tpu.data.corpus import CorpusConfig, build_corpus
from msnv_tpu.data.loader import ChunkLoader
from msnv_tpu.data.synthetic import make_synthetic_corpus
from msnv_tpu.models.samplernn import init_params
from msnv_tpu.training.optim import make_optimizer
from msnv_tpu.training.plugins import GeneratorPlugin, TensorBoardPlugin
from msnv_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def corpus_loader(tmp_path_factory):
    # module-scoped: the corpus build is the expensive part
    root = str(tmp_path_factory.mktemp("plug"))
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=150, cond_len=16)
    ccfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"), overlap_len=16, seq_len=64,
        batch_size=4, cond_len=16, norm_ind=False,
        cache_dir=os.path.join(root, "npy"))
    corpus = build_corpus(ccfg, "train")
    return ChunkLoader(corpus, 64, 16, 16), root


@pytest.fixture()
def setup(corpus_loader):
    # function-scoped trainer: tests mutate trainer.epochs/plugins, so
    # sharing one instance couples them to execution order
    loader, root = corpus_loader
    cfg = ExperimentConfig(
        exp="plug",
        model=ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=24, cond_dim=43,
                          cond_len=16, spk_dim=2),
        train=TrainConfig(seq_len=64, batch_size=4, learning_rate=1e-3))
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    trainer = Trainer(cfg, params, make_optimizer(cfg.train), loader)
    return cfg, trainer, root


def test_generator_plugin_writes_wavs(setup, tmp_path):
    cfg, trainer, root = setup
    samples_dir = str(tmp_path / "samples")
    rng = np.random.RandomState(0)
    cond = rng.rand(2, 2, cfg.model.effective_cond_dim).astype(np.float32)
    spk = np.array([0, 1], np.int32)
    trainer.register_plugin(GeneratorPlugin(samples_dir, cond, spk))
    trainer.run(1)
    wavs = sorted(os.listdir(samples_dir))
    assert len(wavs) == 2
    assert wavs[0].startswith("ep1-")
    from msnv_tpu.data.wavio import read_wav
    audio, sr = read_wav(os.path.join(samples_dir, wavs[0]))
    assert sr == 16000
    assert audio.shape[0] == 2 * cfg.model.lookback


def test_tensorboard_plugin(setup, tmp_path):
    cfg, trainer, root = setup
    log_dir = str(tmp_path / "tb")
    tb = TensorBoardPlugin(log_dir)
    trainer.register_plugin(tb)
    trainer.run(1)
    if tb.writer is None:
        pytest.skip("tensorboardX unavailable")
    files = os.listdir(log_dir)
    assert any("tfevents" in f for f in files)


def test_utterance_slices_alignment(corpus_loader):
    """utterance_slices returns natural audio + conditioners cut from the
    same lane offsets, equal-length across utterances."""
    from msnv_tpu.data.corpus import utterance_slices
    loader, root = corpus_loader
    corpus = loader.corpus
    sl = utterance_slices(corpus, cond_len=16, max_utts=3, max_frames=20)
    assert sl is not None
    audio, cond, spk = sl
    k, n_frames = cond.shape[0], cond.shape[1]
    assert 1 <= k <= 3 and n_frames <= 20
    assert audio.shape == (k, n_frames * 16)
    assert cond.shape[2] == corpus.cond.shape[2]
    assert spk.shape == (k,)
    # each slice must appear verbatim in its lane (audio and cond together)
    for i in range(k):
        found = False
        for b in range(corpus.cond.shape[0]):
            for f0 in range(corpus.cond.shape[1] - n_frames + 1):
                if np.array_equal(
                        corpus.cond[b, f0:f0 + n_frames].astype(np.float32),
                        cond[i]):
                    seg = corpus.data[b, f0 * 16:(f0 + n_frames) * 16]
                    assert np.array_equal(seg.astype(np.float32), audio[i])
                    # the run lies inside ONE utterance
                    assert len(set(corpus.audio_id[b, f0:f0 + n_frames])) == 1
                    found = True
                    break
            if found:
                break
        assert found, f"slice {i} not found in any lane"
    # distinct utterances
    assert len({tuple(a[:32]) for a in audio}) == k


def test_objective_metrics_plugin(setup):
    """ObjectiveMetricsPlugin scores generated audio vs ground truth each
    epoch and surfaces mcd/f0/vuv stats."""
    from msnv_tpu.data.corpus import utterance_slices
    from msnv_tpu.training.plugins import ObjectiveMetricsPlugin
    cfg, trainer, root = setup
    sl = utterance_slices(trainer.loader.corpus, cond_len=16,
                          max_utts=2, max_frames=8)
    assert sl is not None
    audio, cond, spk = sl
    trainer.register_plugin(ObjectiveMetricsPlugin(
        cond, spk, audio, every=2, hop=16))
    trainer.run(1)
    # epoch 1 is unscored (every=2): stats must be None, not stale/absent
    assert trainer.stats["mcd_db"]["last"] is None
    trainer.run(2)
    for f in ("mcd_db", "f0_rmse_hz", "vuv_error_rate"):
        assert f in trainer.stats, trainer.stats.keys()
    assert np.isfinite(trainer.stats["mcd_db"]["last"])
    assert trainer.stats["mcd_db"]["last"] > 0.0
    assert 0.0 <= trainer.stats["vuv_error_rate"]["last"] <= 1.0


def test_experiment_logger_plugin():
    """ExperimentLoggerPlugin pushes per-epoch stats to any tracker object
    with log_metric (CometPlugin parity, ref trainer/plugins.py:286-303)."""
    from msnv_tpu.training.plugins import ExperimentLoggerPlugin

    class FakeExperiment:
        def __init__(self):
            self.metrics, self.epochs = [], []

        def log_metric(self, name, value):
            self.metrics.append((name, value))

        def log_epoch_end(self, epoch_index):
            self.epochs.append(epoch_index)

    class FakeTrainer:
        stats = {"training_loss": {"last": 1.25, "epoch_mean": 1.5},
                 "validation_loss": {"last": 2.0}}

    exp = FakeExperiment()
    plugin = ExperimentLoggerPlugin(
        exp, ["validation_loss", ("training_loss", "epoch_mean")])
    plugin.register(FakeTrainer())
    plugin.epoch(3)
    assert ("validation_loss", 2.0) in exp.metrics
    assert ("training_loss", 1.5) in exp.metrics
    assert exp.epochs == [3]
