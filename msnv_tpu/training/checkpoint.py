"""Checkpointing: params + optimizer state + TBPTT hidden + data cursor.

Capability superset of the reference's SaverPlugin (ref
trainer/plugins.py:113-155 + train.py:110-126):
- `ep{E}-it{I}.npz` per epoch, old "last" checkpoints deleted unless
  keep_old (ref plugins.py:127-129)
- `best-ep{E}-it{I}.npz` tracked on validation loss (ref plugins.py:138-150)
- epoch/iteration parse back out of the filename on resume
  (ref train.py:110-126)
- DEVIATION (improvement, documented): the reference saves only the model
  state_dict — resume restarts Adam moments and the data cursor. We save the
  full training state (params, opt state, hidden state, cursor) so resume is
  exact.

Format: a single .npz with positionally-indexed leaves + a JSON meta entry.
Restore requires a template pytree with the same structure (the caller
rebuilds model/optimizer from the experiment tag, like ref generate.py does).

Alternative backend="orbax" (CheckpointManager / save_checkpoint_orbax):
`ep{E}-it{I}.orbax/` directories written by orbax.checkpoint — for
multi-host sharded training every process writes its own shards
collectively and restore places shards per the template's shardings,
instead of funnelling the whole state through host 0 as one npz.
"""

from __future__ import annotations

import glob
import io
import json
import os
import re
import shutil

import jax
import numpy as np

LAST_PATTERN = "ep{}-it{}.npz"                    # ref plugins.py:117
BEST_PATTERN = "best-ep{}-it{}.npz"               # ref plugins.py:118
_LAST_RE = re.compile(r"^ep(\d+)-it(\d+)\.(npz|orbax)$")
_BEST_RE = re.compile(r"^best-ep(\d+)-it(\d+)\.(npz|orbax)$")


def _path_key(path) -> str:
    return jax.tree_util.keystr(path)


def save_checkpoint(path: str, state, meta: dict | None = None) -> None:
    """Save a pytree `state` (+ JSON-serializable `meta`) to `path`.

    Leaves are stored under their pytree path strings, so loading with a
    partial template (e.g. only {"params": ...}) works — generate.py needs
    just the model weights out of a full training checkpoint.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    arrays = {}
    for p, x in flat:
        try:
            arrays["leaf:" + _path_key(p)] = np.asarray(x)
        except RuntimeError as e:
            # jax.Array spanning non-addressable devices (multi-host
            # model-sharded state) cannot funnel through one npz
            raise RuntimeError(
                f"npz checkpointing requires fully-addressable arrays "
                f"(leaf {_path_key(p)} spans other hosts); use the orbax "
                f"backend (--ckpt_backend orbax) for multi-host sharded "
                f"state") from e
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)  # atomic


def load_checkpoint(path: str, template):
    """Load into the structure of `template`; returns (state, meta).

    Every template path must exist in the checkpoint (KeyError names the
    missing path otherwise); extra checkpoint entries are ignored.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode() or "{}")
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, t in flat:
            key = "leaf:" + _path_key(p)
            if key not in z:
                raise KeyError(f"checkpoint {path} has no entry {key}")
            arr = z[key]
            if hasattr(t, "shape") and tuple(arr.shape) != tuple(t.shape):
                raise ValueError(
                    f"checkpoint {path}: shape mismatch at {key}: "
                    f"saved {tuple(arr.shape)} vs expected "
                    f"{tuple(t.shape)} — wrong config/tag for this "
                    f"checkpoint?")
            if hasattr(t, "dtype"):
                arr = arr.astype(t.dtype)
            # device arrays, not numpy: loaded params feed jitted fns and
            # may be indexed by tracers
            leaves.append(jax.numpy.asarray(arr))
        state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, meta


def _sync_processes(tag: str) -> None:
    """Barrier across hosts (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def save_checkpoint_orbax(path: str, state, meta: dict | None = None) -> None:
    """Save `state` as an orbax checkpoint directory at `path`.

    Multi-host: call from ALL processes (orbax saves collectively; each host
    writes the shards it owns). Filesystem mutations around the collective
    save (clearing a stale dir, writing `<path>/msnv_meta.json`) happen on
    process 0 only, fenced by barriers so no process races them.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if jax.process_index() == 0 and os.path.exists(path):
        shutil.rmtree(path)
    _sync_processes("msnv-orbax-pre-save")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state)
    if jax.process_index() == 0:
        with open(os.path.join(path, "msnv_meta.json"), "w") as f:
            json.dump(meta or {}, f)
    _sync_processes("msnv-orbax-post-save")


def _subtree_like(template, full, where="state"):
    """Extract `template`'s structure out of the restored `full` tree
    (same partial-template contract as the npz loader: every template
    path must exist; extra checkpoint entries are ignored)."""
    if isinstance(template, dict):
        if not isinstance(full, dict):
            raise KeyError(f"checkpoint has no dict at {where}")
        out = {}
        for k, v in template.items():
            if k not in full:
                raise KeyError(f"checkpoint has no entry {where}[{k!r}]")
            out[k] = _subtree_like(v, full[k], f"{where}[{k!r}]")
        return out
    if isinstance(template, (list, tuple)):
        if len(full) != len(template):
            raise KeyError(
                f"checkpoint sequence at {where} has {len(full)} entries, "
                f"template wants {len(template)}")
        seq = [_subtree_like(t, f, f"{where}[{i}]")
               for i, (t, f) in enumerate(zip(template, full))]
        if isinstance(template, tuple):
            # NamedTuples (e.g. optax states) construct from *args
            if hasattr(template, "_fields"):
                return type(template)(*seq)
            return tuple(seq)
        return seq
    return full  # leaf: take the restored value


def load_checkpoint_orbax(path: str, template):
    """Restore an orbax checkpoint into `template`'s structure.

    Partial templates work like the npz loader's (e.g. {"params": ...} out
    of a full training checkpoint — the generate/evaluate/warm-start path):
    when the template's top-level structure is a strict subset of what was
    saved, the full tree is restored and the requested subtree extracted.
    Exact-structure templates restore directly, with template leaves that
    are sharded jax.Arrays placing shards per their shardings (multi-host
    resume never funnels state through one host).
    """
    import orbax.checkpoint as ocp
    path = _norm_ckpt_path(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            state = ckptr.restore(path, item=template)
        except ValueError:
            # partial template: restore everything, extract the subtree
            full = ckptr.restore(path)
            state = _subtree_like(template, full)
    meta_path = os.path.join(path, "msnv_meta.json")
    meta = {}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def _norm_ckpt_path(path: str) -> str:
    """Normalize (strip trailing slashes) so format dispatch on the
    extension works for tab-completed directory paths."""
    return os.path.abspath(os.path.normpath(path))


def _load_meta(path: str) -> dict:
    """Read just the meta dict from either checkpoint format."""
    path = _norm_ckpt_path(path)
    if path.endswith(".orbax"):
        meta_path = os.path.join(path, "msnv_meta.json")
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                return json.load(f)
        return {}
    with np.load(path) as z:
        return json.loads(bytes(z["__meta__"].tobytes()).decode() or "{}")


def load_any(path: str, template):
    """Format-dispatching load: .orbax dir or .npz file."""
    path = _norm_ckpt_path(path)
    if path.endswith(".orbax"):
        return load_checkpoint_orbax(path, template)
    return load_checkpoint(path, template)


class CheckpointManager:
    """last/best retention policy over a checkpoints directory.

    backend: "npz" (default, single-file, host-0 gather) or "orbax"
    (directory checkpoints, collective multi-host sharded save/restore).
    Both formats are discovered by latest()/best(), so a run can switch
    backends and still resume from its history.
    """

    def __init__(self, checkpoints_dir: str, keep_old: bool = False,
                 backend: str = "npz"):
        assert backend in ("npz", "orbax"), backend
        self.dir = checkpoints_dir
        self.keep_old = keep_old
        self.backend = backend
        os.makedirs(checkpoints_dir, exist_ok=True)
        # recover the historical best from an existing best checkpoint's
        # meta, so a resumed run never overwrites a better past best
        self._best_loss = float("inf")
        existing = self.best()
        if existing is not None:
            try:
                meta = _load_meta(existing[0])
                self._best_loss = float(meta.get("val_loss", float("inf")))
            except Exception:
                pass
        # Multi-host: hosts without a shared checkpoints filesystem recover
        # different _best_loss values (process 0 sees the real history, the
        # rest glob an empty local dir -> inf). Every save decision compares
        # against _best_loss and _save contains a cross-host barrier, so a
        # divergent value means mismatched collective participation (hang).
        # Adopt process 0's view everywhere up front.
        if jax.process_count() > 1:
            import numpy as _np
            from jax.experimental import multihost_utils
            # broadcast the float64 losslessly as its uint64 bit pattern
            # (an f32 cast would round _best_loss on every host, letting a
            # resumed run mis-rank a loss within f32 epsilon of the best)
            bits = multihost_utils.broadcast_one_to_all(
                _np.asarray(self._best_loss, _np.float64).view(_np.uint64))
            self._best_loss = float(
                _np.asarray(bits, _np.uint64).view(_np.float64))

    def _save(self, path, state, meta):
        if self.backend == "orbax":
            save_checkpoint_orbax(path, state, meta)
            return
        # npz is a host-0 single-file format: only process 0 writes (all
        # hosts hold replicas under pure DP; sharded state needs orbax —
        # save_checkpoint raises a pointed error), and the barrier keeps
        # other hosts from resuming/deleting around a mid-flight write
        if jax.process_index() == 0:
            save_checkpoint(path, state, meta)
        _sync_processes("msnv-npz-save")

    @staticmethod
    def _remove(path):
        (shutil.rmtree if os.path.isdir(path) else os.remove)(path)

    def _fmt(self, pattern, epoch, iteration):
        name = pattern.format(epoch, iteration)
        if self.backend == "orbax":
            name = name[:-len(".npz")] + ".orbax"
        return os.path.join(self.dir, name)

    def _retain_only(self, keep_path, regex):
        """Delete checkpoints matching `regex` except `keep_path`."""
        for p in glob.glob(os.path.join(self.dir, "*ep*-it*.*")):
            if regex.match(os.path.basename(p)) and \
                    os.path.abspath(p) != os.path.abspath(keep_path):
                self._remove(p)

    @property
    def best_loss(self) -> float:
        """Best validation loss seen by save_epoch (inf before any)."""
        return self._best_loss

    def save_epoch(self, state, epoch: int, iteration: int,
                   val_loss: float | None = None, meta: dict | None = None,
                   save_last: bool = True):
        """save_last=False saves/retains only the best-checkpoint side
        (used by SaverPlugin's every_n_epochs thinning: an off-schedule
        epoch that improved validation still pins a best checkpoint)."""
        meta = dict(meta or {}, epoch=epoch, iteration=iteration)
        # WRITE-then-delete: the new checkpoint lands before old ones are
        # removed, so a crash/preemption mid-save never leaves the run with
        # zero resumable checkpoints. Retention deletes are process-0-only;
        # the barrier inside _save fences them from other hosts' reads.
        proc0 = jax.process_index() == 0
        path = self._fmt(LAST_PATTERN, epoch, iteration)
        written = None
        if save_last:
            self._save(path, state, meta)
            if not self.keep_old and proc0:
                self._retain_only(path, _LAST_RE)
            written = path
        if val_loss is not None and val_loss < self._best_loss:
            self._best_loss = val_loss
            best = self._fmt(BEST_PATTERN, epoch, iteration)
            self._save(best, state, dict(meta, val_loss=val_loss))
            if proc0:
                self._retain_only(best, _BEST_RE)
            written = written or best
        # a path that was actually written (last if both); None if neither
        return written

    def latest(self):
        """Newest last-checkpoint path + (epoch, iteration), or None.

        Natural-sort on the numeric fields parsed from the filename
        (ref train.py:110-126).
        """
        found = []
        for p in glob.glob(os.path.join(self.dir, "ep*-it*.*")):
            m = _LAST_RE.match(os.path.basename(p))
            if m:
                found.append((int(m.group(1)), int(m.group(2)), p))
        if not found:
            return None
        e, i, p = max(found)
        return p, e, i

    def best(self):
        found = []
        for p in glob.glob(os.path.join(self.dir, "best-ep*-it*.*")):
            m = _BEST_RE.match(os.path.basename(p))
            if m:
                found.append((int(m.group(1)), int(m.group(2)), p))
        if not found:
            return None
        e, i, p = max(found)
        return p, e, i
