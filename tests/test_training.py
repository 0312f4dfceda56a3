"""Training engine: loss decreases on a tiny corpus, plugin events fire,
checkpoint/resume is exact, optimizer semantics (clip + adam + schedule)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msnv_tpu.config import (DataConfig, ExperimentConfig, ModelConfig,
                             TrainConfig)
from msnv_tpu.data.corpus import CorpusConfig, build_corpus
from msnv_tpu.data.loader import ChunkLoader
from msnv_tpu.data.synthetic import make_synthetic_corpus
from msnv_tpu.models.samplernn import init_params
from msnv_tpu.training.checkpoint import (CheckpointManager, load_checkpoint,
                                          save_checkpoint)
from msnv_tpu.training.optim import make_optimizer, lr_schedule
from msnv_tpu.training.plugins import (AbsoluteTimeMonitor, Logger,
                                       SaverPlugin, StatsPlugin,
                                       TrainingLossMonitor, ValidationPlugin)
from msnv_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("train_corpus"))
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=150, cond_len=16,
                          partitions=("train", "validation", "test"))
    ccfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"),
        overlap_len=16, seq_len=64, batch_size=4, cond_len=16,
        norm_ind=False, cache_dir=os.path.join(root, "npy"))
    corpus = build_corpus(ccfg, "train")
    loader = ChunkLoader(corpus, seq_len=64, overlap_len=16, cond_len=16)

    cfg = ExperimentConfig(
        exp="test",
        model=ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=32, cond_dim=43,
                          cond_len=16, spk_dim=2),
        train=TrainConfig(seq_len=64, batch_size=4, learning_rate=2e-3),
    )
    return cfg, ccfg, corpus, loader, root


def make_trainer(cfg, loader, seed=0):
    params = init_params(jax.random.PRNGKey(seed), cfg.model)
    opt = make_optimizer(cfg.train)
    return Trainer(cfg, params, opt, loader)


def test_loss_decreases(tiny_setup):
    cfg, _, _, loader, _ = tiny_setup
    trainer = make_trainer(cfg, loader)
    first = float(trainer.train_chunk(loader.get_chunk(0)))
    for _ in range(3):
        trainer.train_epoch()
    last = float(trainer.train_chunk(loader.get_chunk(0)))
    assert last < first - 0.3, (first, last)


def test_plugins_and_stats(tiny_setup, tmp_path):
    cfg, ccfg, _, loader, _ = tiny_setup
    trainer = make_trainer(cfg, loader)
    val = build_corpus(ccfg, "validation")
    val_loader = ChunkLoader(val, 64, 16, 16)
    results = str(tmp_path / "results")
    os.makedirs(results)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    trainer.register_plugin(TrainingLossMonitor(smoothing=0.99))
    trainer.register_plugin(ValidationPlugin(val_loader, val_loader))
    trainer.register_plugin(AbsoluteTimeMonitor())
    trainer.register_plugin(SaverPlugin(mgr))
    trainer.register_plugin(Logger(["training_loss", "validation_loss",
                                    "test_loss", "time"]))
    trainer.register_plugin(StatsPlugin(results, plot=False))
    trainer.run(2)

    assert trainer.stats["training_loss"]["last"] > 0
    assert trainer.stats["training_loss"]["running_avg"] > 0
    assert trainer.stats["validation_loss"]["last"] > 0
    assert trainer.stats["time"]["last"] > 0
    assert os.path.isfile(os.path.join(results, "stats.json"))
    assert mgr.latest() is not None
    _, e, it = mgr.latest()
    assert e == 2 and it == trainer.iterations
    assert mgr.best() is not None  # val loss finite -> best tracked


def test_checkpoint_resume_exact(tiny_setup, tmp_path):
    cfg, _, _, loader, _ = tiny_setup
    t1 = make_trainer(cfg, loader, seed=1)
    t1.run(1)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, t1.checkpoint_state(),
                    {"epoch": t1.epochs, "iteration": t1.iterations})
    # continue t1 for one more epoch
    t1.run(2)

    # resume a fresh trainer from the checkpoint and do the same epoch
    t2 = make_trainer(cfg, loader, seed=2)  # different init (overwritten)
    state, meta = load_checkpoint(path, t2.checkpoint_state())
    t2.restore(state, meta)
    assert t2.epochs == 1
    t2.run(2)

    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert t1.iterations == t2.iterations


def test_checkpoint_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep_old=False)
    state = {"w": jnp.ones(3)}
    mgr.save_epoch(state, 1, 10, val_loss=5.0)
    mgr.save_epoch(state, 2, 20, val_loss=4.0)
    mgr.save_epoch(state, 3, 30, val_loss=6.0)
    files = sorted(os.listdir(str(tmp_path)))
    # only the newest 'last' remains; best is epoch 2
    assert files == ["best-ep2-it20.npz", "ep3-it30.npz"]


def test_grad_clip_semantics():
    # optax.clip clips element-wise to [-1, 1] like the reference's hardtanh
    # on grads (ref optim.py:10-14)
    import optax
    tc = TrainConfig(learning_rate=1.0, grad_clip=1.0)
    opt = make_optimizer(tc)
    params = {"w": jnp.zeros(3)}
    g = {"w": jnp.array([-5.0, 0.5, 7.0])}
    st = opt.init(params)
    updates, _ = opt.update(g, st, params)
    # adam normalizes magnitude; sign pattern must match the clipped grad
    np.testing.assert_array_equal(np.sign(np.asarray(updates["w"])),
                                  [1.0, -1.0, -1.0])


def test_lr_schedule_multistep():
    tc = TrainConfig(learning_rate=1e-3, scheduler=True,
                     scheduler_milestones=(2, 4), scheduler_gamma=0.1)
    sched = lr_schedule(tc, steps_per_epoch=10)
    assert np.isclose(sched(0), 1e-3)
    assert np.isclose(sched(19), 1e-3)
    assert np.isclose(sched(20), 1e-4)
    assert np.isclose(sched(39), 1e-4)
    assert np.isclose(sched(40), 1e-5)


def test_midepoch_checkpoint_resume(tiny_setup, tmp_path):
    """Mid-epoch saves carry the data cursor; resume continues at the exact
    chunk and converges to the same params as uninterrupted training."""
    cfg, _, _, loader, _ = tiny_setup
    n = len(loader)
    assert n >= 4

    # uninterrupted: one full epoch
    t_full = make_trainer(cfg, loader, seed=5)
    t_full.run(1)

    # interrupted: stop after 2 chunks, checkpoint with cursor, resume
    t_a = make_trainer(cfg, loader, seed=5)
    mgr = CheckpointManager(str(tmp_path / "mid"))
    t_a.register_plugin(SaverPlugin(mgr, every_n_iterations=2))
    for chunk in loader.epoch():
        t_a.chunk_index = chunk.index
        t_a.train_chunk(chunk)
        t_a.iterations += 1
        t_a._call_plugins("iteration", 0.0)
        if t_a.iterations == 2:
            break

    path, e, it = mgr.latest()
    assert it == 2 and e == 0
    t_b = make_trainer(cfg, loader, seed=6)
    state, meta = load_checkpoint(path, t_b.checkpoint_state())
    t_b.restore(state, meta)
    assert t_b.start_chunk == 2
    t_b.run(1)

    for a, b in zip(jax.tree_util.tree_leaves(t_full.params),
                    jax.tree_util.tree_leaves(t_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bf16_mixed_precision_training(tiny_setup):
    """bf16 train step runs, loss is close to f32, and learning works."""
    from msnv_tpu.training.step import make_train_step
    cfg, _, _, loader, _ = tiny_setup
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg.train)
    opt_state = opt.init(params)
    from msnv_tpu.models.samplernn import init_tier_state
    state = init_tier_state(cfg.model, 4)
    step16 = make_train_step(cfg.model, opt, donate=False,
                             compute_dtype=jnp.bfloat16)
    step32 = make_train_step(cfg.model, opt, donate=False)
    c = loader.get_chunk(0)
    args = (jnp.asarray(c.data), jnp.asarray(True), jnp.asarray(c.target),
            jnp.asarray(c.cond), jnp.asarray(c.spk))
    _, _, _, l16 = step16(params, opt_state, state, *args)
    _, _, _, l32 = step32(params, opt_state, state, *args)
    assert abs(float(l16) - float(l32)) < 0.05, (float(l16), float(l32))
    # a few bf16 steps reduce the loss
    p, o, s = params, opt_state, state
    first = None
    for k in range(8):
        p, o, s, l = step16(p, o, s, jnp.asarray(c.data),
                            jnp.asarray(k == 0), jnp.asarray(c.target),
                            jnp.asarray(c.cond), jnp.asarray(c.spk))
        first = first or float(l)
    assert float(l) < first - 0.2
    # master params stay f32
    assert p["mlp"]["hidden"]["w"].dtype == jnp.float32


def _trainer(cfg, loader, device_corpus, seed=0):
    params = init_params(jax.random.PRNGKey(seed), cfg.model)
    return Trainer(cfg, params, make_optimizer(cfg.train), loader,
                   device_corpus=device_corpus)


def test_device_corpus_matches_host_path(tiny_setup):
    """device_corpus=True (in-jit chunk slicing by index) must reproduce
    the host-sliced training trajectory exactly — same params, same
    per-iteration losses, same validation score."""
    cfg, ccfg, corpus, loader, root = tiny_setup

    t_host = _trainer(cfg, loader, device_corpus=False)
    t_dev = _trainer(cfg, loader, device_corpus=True)
    assert t_dev._step_indexed is not None and t_host._step_indexed is None

    class Capture:
        def __init__(self):
            self.losses = []

        def register(self, trainer):
            pass

        def iteration(self, loss):
            self.losses.append(loss)

        def epoch(self, epoch_index):
            pass

    cap_h, cap_d = Capture(), Capture()
    t_host.register_plugin(cap_h)
    t_dev.register_plugin(cap_d)
    t_host.run(2)
    t_dev.run(2)
    assert len(cap_h.losses) == len(cap_d.losses) > 0
    np.testing.assert_allclose(cap_h.losses, cap_d.losses, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(t_host.params),
                    jax.tree_util.tree_leaves(t_dev.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # evaluation rides the device path and agrees too
    assert t_dev.evaluate(loader) == pytest.approx(
        t_host.evaluate(loader), abs=1e-5)


def test_pipelined_flush_checkpoint_snapshot(tiny_setup, tmp_path):
    """Mid-epoch interval saves under the pipelined loss flush must store
    the state AS OF the saved cursor (not the one-step-ahead live state):
    resuming from such a save reproduces uninterrupted training exactly."""
    cfg, ccfg, corpus, loader, root = tiny_setup

    # uninterrupted: 2 epochs
    t_a = _trainer(cfg, loader, device_corpus=True)
    t_a.run(2)

    # same run with an interval saver (every 2 iterations)
    ckpt_dir = str(tmp_path / "ckpts")
    t_b = _trainer(cfg, loader, device_corpus=True)
    manager = CheckpointManager(ckpt_dir, keep_old=True)
    t_b.register_plugin(SaverPlugin(manager, every_n_iterations=2))
    t_b.run(1)   # epoch 1 with mid-epoch saves
    saves = sorted(p for p in os.listdir(ckpt_dir) if p.endswith(".npz"))
    assert len(saves) > 1
    # resume a FRESH trainer from a mid-epoch save inside epoch 1
    mid = os.path.join(ckpt_dir, saves[0])
    t_c = _trainer(cfg, loader, device_corpus=True)
    state, meta = load_checkpoint(mid, t_c.checkpoint_state())
    t_c.restore(state, meta)
    assert t_c.start_chunk > 0   # genuinely mid-epoch
    t_c.run(2)
    for a, b in zip(jax.tree_util.tree_leaves(t_a.params),
                    jax.tree_util.tree_leaves(t_c.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_saver_every_n_epochs(tiny_setup, tmp_path):
    """every_n_epochs thins 'last' saves (epochs 3 and final 7 here) but
    still pins a best checkpoint on ANY epoch that improves validation,
    and resume picks up from the thinned latest."""
    cfg, ccfg, _, loader, _ = tiny_setup
    val = build_corpus(ccfg, "validation")
    val_loader = ChunkLoader(val, 64, 16, 16)

    saved = []
    t = make_trainer(cfg, loader, seed=3)
    mgr = CheckpointManager(str(tmp_path / "thin"))
    orig = mgr.save_epoch

    def spy(state, epoch, iteration, val_loss=None, meta=None,
            save_last=True):
        saved.append((epoch, save_last))
        return orig(state, epoch, iteration, val_loss=val_loss, meta=meta,
                    save_last=save_last)

    mgr.save_epoch = spy
    t.register_plugin(ValidationPlugin(val_loader, val_loader))
    t.register_plugin(SaverPlugin(mgr, every_n_epochs=3))
    t.run(7)

    last_epochs = sorted(e for e, save_last in saved if save_last)
    assert last_epochs[-1] == 7                 # final epoch always saves
    assert 3 in last_epochs and 6 in last_epochs
    assert 1 not in last_epochs and 2 not in last_epochs
    _, e, _ = mgr.latest()
    assert e == 7
    # loss improves steadily at this scale -> best saved off-schedule too
    assert mgr.best() is not None
    # old 'last' checkpoints retained only once per save
    import glob as _glob
    lasts = [p for p in _glob.glob(str(tmp_path / "thin" / "ep*-it*.*"))]
    assert len(lasts) == 1   # retention keeps only the newest last
