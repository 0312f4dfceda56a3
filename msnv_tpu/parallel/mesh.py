"""Device mesh + sharding layout for data-parallel training and generation.

The reference is single-process single-GPU (SURVEY.md §2.9: no distributed
code at all); this module is the new TPU-native scale-out component:

- 1-axis Mesh(('data',)) over all chips/hosts by default; an optional
  'model' axis tensor-shards the wide GRU/MLP weights.
- params replicated over 'data' (sharded over 'model' where enabled);
  batch/cond/spk/hidden-state sharded along the batch axis.
- gradients are combined by XLA-inserted collectives (psum over ICI) when
  the jitted train step has sharded inputs + replicated outputs — the same
  code path runs 1 chip -> N hosts.

Multi-host entry: call `jax.distributed.initialize()` before `make_mesh()`
on pod slices; `jax.devices()` then spans all hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/lane) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_sharding(mesh: Mesh) -> NamedSharding:
    """Tier hidden state (n_rnn, B, dim): batch axis is dim 1."""
    return NamedSharding(mesh, P(None, "data"))


def corpus_sharding(mesh: Mesh) -> dict:
    """Shardings for a device-resident packed corpus
    (data/loader.device_arrays): lanes over 'data' — the lane<->replica
    assignment is static for the whole epoch, as TBPTT state carry
    requires. The per-chunk speaker table is (num_chunks, B)."""
    return {
        "qdata": batch_sharding(mesh),
        "cond": batch_sharding(mesh),
        "spk": NamedSharding(mesh, P(None, "data")),
    }


def param_sharding(mesh: Mesh, params):
    """Sharding pytree for model params.

    Data axis: fully replicated. Model axis (when >1): shard the wide
    dim-sized output axes of GRU and MLP weights; small tables/biases
    replicated. XLA inserts the all-gathers/reduce-scatters.
    """
    n_model = mesh.shape["model"]

    def spec_for(path, x) -> NamedSharding:
        if n_model == 1 or x.ndim == 0:
            return NamedSharding(mesh, P())
        names = [getattr(p, "name", getattr(p, "key", "")) for p in path]
        name = ".".join(str(n) for n in names)
        # GRU weights (3H, in)/(3H, H): shard gate-stacked rows.
        if "w_ih" in name or "w_hh" in name or "b_ih" in name or "b_hh" in name:
            if x.shape[0] % n_model == 0:
                return NamedSharding(mesh, P("model"))
        # dense weights (out, in): shard out where divisible
        if name.endswith(".w") and x.ndim == 2 and x.shape[0] % n_model == 0:
            return NamedSharding(mesh, P("model"))
        # upsample (in, r, out): shard out
        if "upsample" in name and x.ndim == 3 and x.shape[2] % n_model == 0:
            return NamedSharding(mesh, P(None, None, "model"))
        # mlp conv_in (fs0, q, dim): shard dim
        if "conv_in" in name and x.ndim == 3 and x.shape[2] % n_model == 0:
            return NamedSharding(mesh, P(None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
