"""Orbax checkpoint backend: round-trip, manager retention/discovery over
both formats, and sharded save/restore on the virtual 8-device mesh."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from msnv_tpu.training.checkpoint import (CheckpointManager, load_any,
                                          load_checkpoint_orbax,
                                          save_checkpoint,
                                          save_checkpoint_orbax)


def _state(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "params": {"w": jnp.asarray(rng.rand(4, 3), jnp.float32),
                   "b": jnp.asarray(rng.rand(3), jnp.float32)},
        "step": jnp.asarray(seed, jnp.int32),
    }


def _zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def test_orbax_round_trip(tmp_path):
    state = _state(1)
    path = str(tmp_path / "ck.orbax")
    save_checkpoint_orbax(path, state, {"epoch": 3, "val_loss": 1.5})
    out, meta = load_checkpoint_orbax(path, _zeros_like(state))
    assert meta == {"epoch": 3, "val_loss": 1.5}
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_any_dispatches(tmp_path):
    state = _state(2)
    npz = str(tmp_path / "a.npz")
    orb = str(tmp_path / "b.orbax")
    save_checkpoint(npz, state, {"k": 1})
    save_checkpoint_orbax(orb, state, {"k": 2})
    _, m1 = load_any(npz, _zeros_like(state))
    _, m2 = load_any(orb, _zeros_like(state))
    assert (m1["k"], m2["k"]) == (1, 2)


def test_manager_orbax_retention_and_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path), backend="orbax")
    mgr.save_epoch(_state(1), 1, 10, val_loss=2.0)
    mgr.save_epoch(_state(2), 2, 20, val_loss=1.0)
    mgr.save_epoch(_state(3), 3, 30, val_loss=1.5)   # worse: best stays ep2
    path, e, i = mgr.latest()
    assert (e, i) == (3, 30) and path.endswith("ep3-it30.orbax")
    bpath, be, bi = mgr.best()
    assert (be, bi) == (2, 20)
    # retention: only the newest "last" dir remains
    lasts = [d for d in os.listdir(str(tmp_path)) if d.startswith("ep")]
    assert lasts == ["ep3-it30.orbax"]
    # resume into the saved structure
    out, meta = load_any(path, _zeros_like(_state()))
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(out["step"]), 3)
    # a fresh manager recovers the best loss from the orbax meta
    mgr2 = CheckpointManager(str(tmp_path), backend="orbax")
    assert mgr2._best_loss == 1.0


def test_manager_discovers_mixed_formats(tmp_path):
    npz_mgr = CheckpointManager(str(tmp_path), backend="npz", keep_old=True)
    npz_mgr.save_epoch(_state(1), 1, 10)
    orb_mgr = CheckpointManager(str(tmp_path), backend="orbax",
                                keep_old=True)
    orb_mgr.save_epoch(_state(2), 2, 20)
    path, e, i = orb_mgr.latest()
    assert (e, i) == (2, 20) and path.endswith(".orbax")
    # npz manager sees the orbax checkpoint as newest too
    path2, e2, _ = npz_mgr.latest()
    assert e2 == 2 and path2.endswith(".orbax")


def test_orbax_sharded_round_trip(tmp_path):
    """Sharded params save and restore with their shardings intact (the
    multi-host path, exercised on the 8-device CPU mesh)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    sh = NamedSharding(mesh, P("data", "model"))
    w = jax.device_put(jnp.arange(64., dtype=jnp.float32).reshape(8, 8), sh)
    state = {"w": w, "b": jnp.ones((8,), jnp.float32)}
    path = str(tmp_path / "sharded.orbax")
    save_checkpoint_orbax(path, state, {"sharded": True})

    tpl = {"w": jax.device_put(jnp.zeros((8, 8), jnp.float32), sh),
           "b": jnp.zeros((8,), jnp.float32)}
    out, meta = load_checkpoint_orbax(path, tpl)
    assert meta == {"sharded": True}
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(w))
    assert out["w"].sharding.is_equivalent_to(sh, 2)


def test_orbax_partial_template_restore(tmp_path):
    """The generate/evaluate/warm-start path: restore only {"params": ...}
    out of a FULL training checkpoint (params + opt state + tier state)."""
    full = {"params": _state(3)["params"],
            "opt_state": {"m": jnp.zeros((4, 3)), "v": jnp.ones((4, 3))},
            "tier_state": [jnp.zeros((2, 3)), jnp.ones((2, 3))]}
    path = str(tmp_path / "full.orbax")
    save_checkpoint_orbax(path, full, {"epoch": 7})
    tpl = {"params": _zeros_like(full["params"])}
    out, meta = load_checkpoint_orbax(path, tpl)
    assert meta["epoch"] == 7
    assert set(out) == {"params"}
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(full["params"]["w"]))
    # missing template paths still fail loudly
    import pytest
    with pytest.raises(KeyError):
        load_checkpoint_orbax(path, {"nope": jnp.zeros(())})


def test_orbax_trailing_slash_dispatch(tmp_path):
    """Tab-completed 'dir.orbax/' paths dispatch to the orbax loader."""
    state = _state(4)
    path = str(tmp_path / "ck.orbax")
    save_checkpoint_orbax(path, state, {"k": 9})
    out, meta = load_any(path + "/", _zeros_like(state))
    assert meta["k"] == 9
    np.testing.assert_array_equal(np.asarray(out["step"]), 4)
