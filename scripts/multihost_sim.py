#!/usr/bin/env python
"""Multi-host simulation: N separate processes, jax.distributed, one
sharded train step over the global device mesh.

Each process owns 4 virtual CPU devices; the coordinator stitches them into
one global mesh and the sharded train step runs across process boundaries —
the same code path a real TPU pod slice uses. Run:

  python scripts/multihost_sim.py            # spawns 2 workers
  python scripts/multihost_sim.py --worker I # internal
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
LOCAL_DEVICES = 4
PORT = 12355


def worker(process_id: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC, process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    from msnv_tpu.config import ModelConfig, TrainConfig
    from msnv_tpu.models.samplernn import init_params, init_tier_state
    from msnv_tpu.parallel.mesh import make_mesh
    from msnv_tpu.training.optim import make_optimizer
    from msnv_tpu.training.step import make_train_step

    n_global = len(jax.devices())
    assert n_global == N_PROC * LOCAL_DEVICES, jax.devices()

    m = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=32, cond_dim=7,
                    cond_len=4, spk_dim=2)
    t = TrainConfig(seq_len=64, batch_size=n_global, learning_rate=1e-3)
    params = init_params(jax.random.PRNGKey(0), m)
    state = init_tier_state(m, t.batch_size)
    optimizer = make_optimizer(t)
    opt_state = optimizer.init(params)

    rng = np.random.RandomState(0)  # same data everywhere; mesh shards it
    data = jnp.asarray(rng.randint(0, 256,
                                   (t.batch_size, 64 + m.lookback - 1)),
                       jnp.int32)
    target = jnp.asarray(rng.randint(0, 256, (t.batch_size, 64)), jnp.int32)
    cond = jnp.asarray(rng.rand(t.batch_size, 64 // m.lookback, 7),
                       jnp.float32)
    spk = jnp.asarray(rng.randint(0, 2, (t.batch_size,)), jnp.int32)

    mesh = make_mesh(n_data=n_global, n_model=1)
    step = make_train_step(m, optimizer, mesh=mesh, donate=False)(
        params, opt_state, state)
    for k in range(2):
        params, opt_state, state, loss = step(
            params, opt_state, state, data, jnp.asarray(k == 0), target,
            cond, spk)
    # --- shared-filesystem discipline: corpus cache + npz checkpoints ---
    # both processes enter build_corpus COLD; process 0 must build alone
    # (others barrier then load) — no torn concurrent np.save's
    sim_tmp = os.environ["MSNV_SIM_TMP"]
    from msnv_tpu.data.corpus import CorpusConfig, build_corpus
    ccfg = CorpusConfig(
        datasets_path=sim_tmp, wav_path=os.path.join(sim_tmp, "wav"),
        cond_path=os.path.join(sim_tmp, "cond"), overlap_len=16,
        seq_len=32, batch_size=2, cond_len=16, norm_ind=False,
        cache_dir=os.path.join(sim_tmp, "npy"))
    corpus = build_corpus(ccfg, "train")
    assert corpus.data.shape[0] == 2

    # npz checkpoints: only process 0 writes; the barrier inside _save
    # fences the other host, which must then be able to restore
    from msnv_tpu.training.checkpoint import (CheckpointManager,
                                              load_checkpoint)
    mgr = CheckpointManager(os.path.join(sim_tmp, "ckpts"))
    mgr.save_epoch({"params": params}, 1, 10)
    latest = mgr.latest()
    assert latest is not None, "no checkpoint visible after fenced save"
    restored, meta = load_checkpoint(latest[0], {"params": params})
    assert meta["epoch"] == 1

    # orbax backend: every process writes its owned shards collectively,
    # then both restore — the real multi-host checkpoint path
    from msnv_tpu.training.checkpoint import load_checkpoint_orbax
    omgr = CheckpointManager(os.path.join(sim_tmp, "ckpts_orbax"),
                             backend="orbax")
    omgr.save_epoch({"params": params}, 2, 20, val_loss=1.0)
    olatest = omgr.latest()
    assert olatest is not None and olatest[0].endswith(".orbax")
    orestored, ometa = load_checkpoint_orbax(olatest[0], {"params": params})
    assert ometa["epoch"] == 2
    import numpy as _np
    _np.testing.assert_array_equal(
        _np.asarray(orestored["params"]["mlp"]["embedding"]),
        _np.asarray(params["mlp"]["embedding"]))

    print(f"MULTIHOST_OK process={process_id} global_devices={n_global} "
          f"loss={float(loss):.6f}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worker", type=int, default=None)
    args = p.parse_args()
    if args.worker is not None:
        worker(args.worker)
        return
    # fixture corpus for the shared-filesystem checks (built BEFORE the
    # workers spawn; the workers race only on the npy cache build)
    import tempfile
    sim_tmp = tempfile.mkdtemp(prefix="msnv_mh_")
    sys.path.insert(0, REPO)
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    make_synthetic_corpus(sim_tmp, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=40, cond_len=16)
    env = dict(os.environ, MSNV_SIM_TMP=sim_tmp)
    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__),
                          "--worker", str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(N_PROC)
    ]
    outputs = [pr.communicate(timeout=600)[0] for pr in procs]
    ok = 0
    losses = set()
    for i, out in enumerate(outputs):
        for line in out.splitlines():
            if line.startswith("MULTIHOST_OK"):
                ok += 1
                losses.add(line.split("loss=")[1])
                print(line)
    assert ok == N_PROC, f"only {ok}/{N_PROC} workers succeeded:\n" + \
        "\n".join(outputs)
    assert len(losses) == 1, f"loss mismatch across hosts: {losses}"
    print("multihost simulation PASSED")


if __name__ == "__main__":
    main()
