"""Multi-device sharding on the virtual 8-device CPU mesh: the sharded train
step must produce the SAME result as the single-device step (DP/TP
correctness), and the graft entry points must compile/run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig, TrainConfig
from msnv_tpu.models.samplernn import init_params, init_tier_state
from msnv_tpu.parallel.mesh import make_mesh, param_sharding
from msnv_tpu.training.optim import make_optimizer
from msnv_tpu.training.step import make_train_step


def tiny_problem(batch):
    m = ModelConfig(frame_sizes=(4, 4), n_rnn=2, dim=64, cond_dim=7,
                    cond_len=4, spk_dim=3)
    t = TrainConfig(seq_len=64, batch_size=batch, learning_rate=1e-3)
    params = init_params(jax.random.PRNGKey(0), m)
    state = init_tier_state(m, batch)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(0, 256, (batch, 64 + m.lookback - 1)),
                       jnp.int32)
    target = jnp.asarray(rng.randint(0, 256, (batch, 64)), jnp.int32)
    cond = jnp.asarray(rng.rand(batch, 64 // m.lookback, 7), jnp.float32)
    spk = jnp.asarray(rng.randint(0, 3, (batch,)), jnp.int32)
    return m, t, params, state, (data, target, cond, spk)


def run_steps(mesh, n_steps=2, batch=8):
    m, t, params, state, (data, target, cond, spk) = tiny_problem(batch)
    optimizer = make_optimizer(t)
    opt_state = optimizer.init(params)
    if mesh is None:
        step = make_train_step(m, optimizer, mesh=None, donate=False)
    else:
        step = make_train_step(m, optimizer, mesh=mesh, donate=False)(
            params, opt_state, state)
    losses = []
    for k in range(n_steps):
        params, opt_state, state, loss = step(
            params, opt_state, state, data, jnp.asarray(k == 0), target,
            cond, spk)
        losses.append(float(loss))
    return params, losses


def test_requires_8_devices():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices")


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    ref_params, ref_losses = run_steps(None)

    for n_data, n_model in [(8, 1), (4, 2), (2, 4)]:
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        p, losses = run_steps(mesh)
        np.testing.assert_allclose(losses, ref_losses, atol=1e-4,
                                   err_msg=f"mesh {n_data}x{n_model}")
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def test_param_sharding_specs():
    m = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=64, cond_dim=7,
                    spk_dim=3)
    params = init_params(jax.random.PRNGKey(0), m)
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = param_sharding(mesh, params)
    # GRU weights sharded over model axis
    s = shardings["tiers"][0]["gru"][0]["w_hh"]
    assert "model" in str(s.spec)
    # h0 replicated
    s0 = shardings["tiers"][0]["h0"]
    assert s0.spec == jax.sharding.PartitionSpec()


@pytest.mark.slow
def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    # dryrun on the full virtual mesh (the driver's own check)
    g.dryrun_multichip(8)
    g.dryrun_multichip(4)


@pytest.mark.slow
def test_graft_entry_flagship_forward():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    jitted = jax.jit(fn)
    loss, _ = jitted(*args)
    assert np.isfinite(float(loss))


def test_sharded_generation():
    """Data-parallel generation: each shard generates its utterances; the
    sharded result equals running each shard's generator locally."""
    from msnv_tpu.models.generate import generate_fn
    from msnv_tpu.parallel.generate import sharded_generate_fn

    m = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                    spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), m)
    mesh = make_mesh(n_data=4, n_model=1)
    rng = np.random.RandomState(0)
    B, frames = 8, 2
    cond = jnp.asarray(rng.rand(B, frames, 5), jnp.float32)
    spk = jnp.asarray(rng.randint(0, 2, (B,)), jnp.int32)
    key = jax.random.PRNGKey(7)

    gen_sharded = sharded_generate_fn(params, m, mesh)
    audio, seq = gen_sharded(cond, spk, key)
    assert audio.shape == (B, frames * m.lookback)
    s = np.asarray(seq)
    assert s.min() >= 0 and s.max() < 256

    # per-shard equivalence: shard i should equal a local run with the
    # folded key on that shard's slice
    inner = generate_fn(params, m)
    shard = B // 4
    for i in range(4):
        k = jax.random.fold_in(key, i)
        _, seq_i = inner(cond[i * shard:(i + 1) * shard],
                         spk[i * shard:(i + 1) * shard], k)
        np.testing.assert_array_equal(
            np.asarray(seq_i), s[i * shard:(i + 1) * shard])


def test_sharded_generation_pallas_interpret():
    from msnv_tpu.parallel.generate import sharded_generate_fn
    m = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                    spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), m)
    mesh = make_mesh(n_data=2, n_model=1)
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.rand(4, 2, 5), jnp.float32)
    spk = jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32)
    gen = sharded_generate_fn(params, m, mesh, use_pallas=True,
                              pallas_opts={"interpret": True, "tile_b": 2})
    audio, seq = gen(cond, spk, jax.random.PRNGKey(0))
    s = np.asarray(seq)
    assert s.shape == (4, 2 * m.lookback)
    assert s.min() >= 0 and s.max() < 256


def gan_tiny_problem(batch):
    m = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=24, cond_dim=7,
                    cond_len=4, spk_dim=3, variant="gan", ind_cond_dim=6)
    t = TrainConfig(seq_len=64, batch_size=batch, learning_rate=1e-3,
                    lambda_weight=(0.0, 0.01, 10.0))
    from msnv_tpu.models.discriminator import discriminator_init
    params = init_params(jax.random.PRNGKey(0), m)
    disc = discriminator_init(jax.random.PRNGKey(1), m.spk_dim, channels=8)
    state = init_tier_state(m, batch)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(0, 256, (batch, 64 + m.lookback - 1)),
                       jnp.int32)
    target = jnp.asarray(rng.randint(0, 256, (batch, 64)), jnp.int32)
    cond = jnp.asarray(rng.rand(batch, 64 // m.lookback, 7), jnp.float32)
    spk = jnp.asarray(rng.randint(0, 3, (batch,)), jnp.int32)
    return m, t, params, disc, state, (data, target, cond, spk)


def test_gan_sharded_step_matches_single_device():
    """The two-optimizer adversarial step over a mesh (both gradient psums
    inserted by XLA) must match the single-device step."""
    from msnv_tpu.training.gan import make_gan_train_step

    def run(mesh, n_steps=2, batch=8):
        m, t, params, disc, state, (data, target, cond,
                                    spk) = gan_tiny_problem(batch)
        main_opt, disc_opt = make_optimizer(t), make_optimizer(t)
        mo, do = main_opt.init(params), disc_opt.init(disc)
        if mesh is None:
            step = make_gan_train_step(m, t, main_opt, disc_opt)
        else:
            step = make_gan_train_step(m, t, main_opt, disc_opt,
                                       mesh=mesh)(params, disc, mo, do,
                                                  state)
        out = []
        for k in range(n_steps):
            params, disc, mo, do, state, metrics = step(
                params, disc, mo, do, state, jnp.asarray(float(k)),
                data, jnp.asarray(k == 0), target, cond, spk)
            out.append((float(metrics["loss"]),
                        float(metrics["disc_loss"])))
        return params, disc, out

    ref_params, ref_disc, ref_metrics = run(None)
    for n_data, n_model in [(8, 1), (4, 2)]:
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        p, d, metrics = run(mesh)
        np.testing.assert_allclose(metrics, ref_metrics, atol=1e-4,
                                   err_msg=f"mesh {n_data}x{n_model}")
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(ref_disc),
                        jax.tree_util.tree_leaves(d)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def test_gan_block_scan_matches_indexed_steps():
    """GAN block scan over a device corpus == sequential indexed steps,
    including the lambda ramp advancing inside the scan."""
    from msnv_tpu.training.gan import (make_gan_train_block_scan,
                                       make_gan_train_step_indexed)

    batch, seq_len, overlap, cis = 4, 64, 16, 4
    m, t, params, disc, state, _ = gan_tiny_problem(batch)
    main_opt, disc_opt = make_optimizer(t), make_optimizer(t)
    mo, do = main_opt.init(params), disc_opt.init(disc)
    n_chunks = 3
    rng = np.random.RandomState(1)
    corpus = {
        "qdata": jnp.asarray(rng.randint(
            0, 256, (batch, (n_chunks + 1) * seq_len + overlap)), jnp.int32),
        "cond": jnp.asarray(rng.rand(batch, (n_chunks + 2) * cis, 7),
                            jnp.float32),
        "spk": jnp.asarray(rng.randint(0, 3, (n_chunks, batch)), jnp.int32),
    }
    geo = (seq_len, overlap, cis)

    scan = make_gan_train_block_scan(m, t, main_opt, disc_opt, *geo,
                                     donate=False)
    (p_s, d_s, _, _, st_s, metrics) = scan(
        params, disc, mo, do, state, jnp.asarray(0.0), corpus,
        jnp.arange(n_chunks, dtype=jnp.int32))

    step = make_gan_train_step_indexed(m, t, main_opt, disc_opt, *geo,
                                       donate=False)
    p, d, mo2, do2, st = params, disc, mo, do, state
    seq_metrics = []
    for k in range(n_chunks):
        p, d, mo2, do2, st, mts = step(p, d, mo2, do2, st,
                                       jnp.asarray(float(k)), corpus,
                                       np.int32(k))
        seq_metrics.append({n: float(v) for n, v in mts.items()})

    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               [mm["loss"] for mm in seq_metrics], atol=1e-5)
    np.testing.assert_allclose(np.asarray(metrics["lambda"]),
                               [mm["lambda"] for mm in seq_metrics],
                               atol=1e-7)
    # ramp actually advanced: lambda strictly increases over the block
    lam = np.asarray(metrics["lambda"])
    assert lam[0] == 0.0 and np.all(np.diff(lam) > 0)
    for a, b in zip(jax.tree_util.tree_leaves((p_s, d_s, st_s)),
                    jax.tree_util.tree_leaves((p, d, st))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_gan_trainer_mesh_device_corpus(tmp_path):
    """Trainer(variant=gan, mesh): device-corpus GAN block scan over the
    mesh matches single-device GAN training (the round-1 gap: the trainer
    used to drop the mesh for the GAN variant)."""
    import os
    from msnv_tpu.config import ExperimentConfig
    from msnv_tpu.data.corpus import CorpusConfig, build_corpus
    from msnv_tpu.data.loader import ChunkLoader
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    from msnv_tpu.models.discriminator import discriminator_init
    from msnv_tpu.training.trainer import Trainer

    root = str(tmp_path)
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=200, cond_len=16,
                          partitions=("train",))
    ccfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"), overlap_len=16, seq_len=64,
        batch_size=8, cond_len=16, norm_ind=False,
        cache_dir=os.path.join(root, "npy"))
    corpus = build_corpus(ccfg, "train")
    loader = ChunkLoader(corpus, 64, 16, 16)
    cfg = ExperimentConfig(
        exp="ganmesh",
        model=ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=24, cond_dim=43,
                          cond_len=16, spk_dim=2, variant="gan",
                          ind_cond_dim=6),
        train=TrainConfig(seq_len=64, batch_size=8, learning_rate=1e-3,
                          lambda_weight=(0.0, 0.01, 10.0)))

    def run(mesh):
        params = init_params(jax.random.PRNGKey(0), cfg.model)
        t = Trainer(cfg, params, make_optimizer(cfg.train), loader,
                    mesh=mesh, device_corpus=True)
        # shrink the discriminator for CPU test speed; rebuild the
        # mesh-built executables against the new templates
        t.disc_params = discriminator_init(jax.random.PRNGKey(9), 2,
                                           channels=8)
        t.disc_opt_state = t.disc_opt.init(t.disc_params)
        if mesh is not None:
            from msnv_tpu.training.gan import (make_gan_train_block_scan,
                                               make_gan_train_step)
            geo = (loader.seq_len, loader.overlap_len, loader.cond_in_seq)
            t._gan_step = make_gan_train_step(
                cfg.model, cfg.train, t.optimizer, t.disc_opt,
                mesh=mesh)(*t._gan_templates())
            t._train_scan = make_gan_train_block_scan(
                cfg.model, cfg.train, t.optimizer, t.disc_opt, *geo,
                mesh=mesh)(*t._gan_templates())
        assert t._train_scan is not None
        losses = []

        class Cap:
            def register(self, tr):
                pass

            def iteration(self, loss):
                losses.append(loss)

            def epoch(self, e):
                pass

        t.register_plugin(Cap())
        t.run(1)
        return t, losses

    t_single, l_single = run(None)
    assert t_single.stats["disc_loss"]["last"] > 0
    assert t_single.stats["lambda"]["last"] > 0
    t_mesh, l_mesh = run(make_mesh(n_data=8, n_model=1))
    np.testing.assert_allclose(l_mesh[:5], l_single[:5], atol=1e-3)
    np.testing.assert_allclose(l_mesh, l_single, atol=5e-2)
    assert t_mesh.stats["lambda"]["last"] == pytest.approx(
        t_single.stats["lambda"]["last"])
    for a, b in zip(jax.tree_util.tree_leaves(t_single.params),
                    jax.tree_util.tree_leaves(t_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=8e-2)


@pytest.mark.slow
def test_multihost_simulation():
    """Two separate processes + jax.distributed + one global sharded step
    (the real multi-host code path, on virtual CPU devices)."""
    import subprocess, sys, os
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "multihost_sim.py")
    out = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, timeout=500)
    assert "multihost simulation PASSED" in out.stdout, out.stdout


@pytest.mark.slow
def test_device_corpus_block_scan_sharded_matches_single():
    """Device-resident corpus + block-scan training over a mesh must match
    single-device device-corpus training (lanes sharded over 'data')."""
    import os
    from msnv_tpu.config import DataConfig, ExperimentConfig
    from msnv_tpu.data.corpus import CorpusConfig, build_corpus
    from msnv_tpu.data.loader import ChunkLoader
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    from msnv_tpu.training.trainer import Trainer
    import tempfile

    root = tempfile.mkdtemp()
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=340, cond_len=16,
                          partitions=("train",))
    ccfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"), overlap_len=16, seq_len=64,
        batch_size=8, cond_len=16, norm_ind=False,
        cache_dir=os.path.join(root, "npy"))
    corpus = build_corpus(ccfg, "train")
    loader = ChunkLoader(corpus, 64, 16, 16)
    cfg = ExperimentConfig(
        exp="meshdev",
        model=ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=32, cond_dim=43,
                          cond_len=16, spk_dim=2),
        train=TrainConfig(seq_len=64, batch_size=8, learning_rate=2e-3))

    def run(mesh):
        params = init_params(jax.random.PRNGKey(0), cfg.model)
        t = Trainer(cfg, params, make_optimizer(cfg.train), loader,
                    mesh=mesh, device_corpus=True)
        assert t._train_scan is not None
        losses = []

        class Cap:
            def register(self, tr):
                pass

            def iteration(self, loss):
                losses.append(loss)

            def epoch(self, e):
                pass

        t.register_plugin(Cap())
        t.run(1)
        return t, losses

    t_single, l_single = run(None)
    for n_data, n_model in [(8, 1), (4, 2)]:
        t_mesh, l_mesh = run(make_mesh(n_data=n_data, n_model=n_model))
        # first steps: tight; the full 39-step trajectory accumulates
        # psum-reduction-order drift (~1e-2 by the end — inherent FP,
        # same as any DP vs single-device comparison)
        np.testing.assert_allclose(l_mesh[:5], l_single[:5], atol=1e-3)
        np.testing.assert_allclose(l_mesh, l_single, atol=5e-2)
        # 39 Adam steps amplify reduction-order noise (~1e-4/step) into
        # per-element drift; the [:5] check above is the correctness gate
        for a, b in zip(jax.tree_util.tree_leaves(t_single.params),
                        jax.tree_util.tree_leaves(t_mesh.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=8e-2)
        # sharded evaluation over the device corpus agrees too
        assert t_mesh.evaluate(loader) == pytest.approx(
            t_single.evaluate(loader), abs=2e-2)


def test_sharded_serving_synthesize():
    """Multi-chip serving (VERDICT r03 stretch #9): with a mesh, the
    /synthesize group call runs sharded_generate_fn_dynamic — lanes shard
    over 'data', and each shard's audio equals a local generator run on
    that shard's slice with the per-shard folded key (the sharded
    generation contract). Exercised through the REAL service + HTTP
    layer on the virtual 8-device mesh."""
    import http.client
    import json
    import threading

    from msnv_tpu.models.generate import generate_fn
    from msnv_tpu.serving import VocoderService, make_server

    m = ModelConfig(frame_sizes=(2, 2), n_rnn=1, dim=16, cond_dim=3,
                    cond_len=4, spk_dim=3)
    params = init_params(jax.random.PRNGKey(0), m)
    mesh = make_mesh(n_data=4, n_model=1)
    svc = VocoderService(params, m, frame_bucket=1, mesh=mesh)
    assert svc.healthz()["mesh_shards"] == 4

    # direct group call: 8 items -> 8 lanes over 4 shards of 2
    rng = np.random.RandomState(3)
    frames = 2
    items = [{"cond": jnp.asarray(rng.rand(frames, m.effective_cond_dim),
                                  jnp.float32),
              "spk": jnp.asarray([i % m.spk_dim], jnp.int32),
              "seed": 0, "n": frames} for i in range(8)]
    outs = svc._run_group((frames, 1.0, "i"), items)
    assert len(outs) == 8
    assert all(o.shape == (frames * m.lookback,) for o in outs)
    # per-shard equality vs a local generator with the folded key
    key = jax.random.PRNGKey(0)
    for it in items[1:]:
        key = jax.random.fold_in(key, it["seed"])
    local = generate_fn(params, m)
    conds = jnp.stack([it["cond"] for it in items])
    spks = jnp.concatenate([it["spk"] for it in items])
    for shard in range(4):
        sl = slice(shard * 2, shard * 2 + 2)
        audio_s, _ = local(conds[sl], spks[sl],
                           jax.random.fold_in(key, shard))
        got = np.stack([np.asarray(o) for o in outs[sl]])
        np.testing.assert_allclose(np.asarray(audio_s), got, atol=1e-6)

    # an odd batch rounds lanes up to a shard multiple (3 -> 4)
    outs3 = svc._run_group((frames, 1.0, "i"), items[:3])
    assert len(outs3) == 3

    # end-to-end over HTTP: one request (lane-padded to 4 shards)
    srv = make_server(svc, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = http.client.HTTPConnection(*srv.server_address, timeout=60)
        c.request("POST", "/synthesize",
                  json.dumps({"cond": np.asarray(items[0]["cond"]).tolist(),
                              "spk": 0}),
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        wav = r.read()
        assert r.status == 200 and wav[:4] == b"RIFF"
        c.close()
    finally:
        svc.close()
        srv.shutdown()


def test_sharded_streaming_push():
    """Round 4: the streaming push sharded over 'data' (the mux-over-mesh
    building block) — K-frame pushes with carry threading equal local
    streaming_fn streams on every shard under the folded-key contract."""
    from msnv_tpu.models.generate import streaming_fn
    from msnv_tpu.parallel.generate import sharded_streaming_fn

    m = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=5,
                    spk_dim=2)
    params = init_params(jax.random.PRNGKey(0), m)
    mesh = make_mesh(n_data=4, n_model=1)
    rng = np.random.RandomState(3)
    B, K, pushes = 8, 2, 3
    spk = jnp.asarray(rng.randint(0, 2, (B,)), jnp.int32)
    conds = [jnp.asarray(rng.rand(B, K, 5), jnp.float32)
             for _ in range(pushes)]
    key = jax.random.PRNGKey(11)

    init_state, push = sharded_streaming_fn(params, m, mesh,
                                            frames_per_push=K)
    carry = init_state(spk, key)
    outs = []
    for cond in conds:
        carry, audio, samples = push(carry, cond)
        assert audio.shape == (B, K * m.lookback)
        outs.append(np.asarray(samples))
    got = np.concatenate(outs, axis=1)

    init_l, push_l = streaming_fn(params, m, frames_per_push=K)
    shard = B // 4
    for i in range(4):
        lc = init_l(shard, spk[i * shard:(i + 1) * shard],
                    jax.random.fold_in(key, i))
        ref = []
        for cond in conds:
            lc, _, s = push_l(lc, cond[i * shard:(i + 1) * shard])
            ref.append(np.asarray(s))
        np.testing.assert_array_equal(
            np.concatenate(ref, axis=1), got[i * shard:(i + 1) * shard])
