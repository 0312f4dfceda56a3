"""Data-parallel batched generation over a device mesh.

The reference generates one utterance at a time in Python (ref
generate.py:154-253); here a batch of utterances is sharded along the
'data' mesh axis and every chip runs the (XLA-scan or Pallas) generator on
its shard — conditioner frames live in that chip's HBM, no collectives on
the hot path. Scales 1 chip -> pod slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import inspect as _inspect

try:                       # jax >= 0.8 moved it out of experimental
    from jax import shard_map as _shard_map
except ImportError:        # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# the replication-check kwarg was renamed check_rep -> check_vma in 0.8
_CHECK_KW = ("check_vma" if "check_vma"
             in _inspect.signature(_shard_map).parameters else "check_rep")


def shard_map(*args, **kwargs):
    if "check_rep" in kwargs:
        kwargs[_CHECK_KW] = kwargs.pop("check_rep")
    return _shard_map(*args, **kwargs)
from jax.sharding import PartitionSpec as P

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.generate import generate_fn


def sharded_generate_fn(params, cfg: ModelConfig, mesh, compute_dtype=None,
                        use_pallas=False, pallas_opts=None,
                        temperature=1.0):
    """Build generate(cond, spk, key) sharded over mesh axis 'data'.

    cond (B, frames, C) and spk (B,) are sharded on B (B must divide by the
    data-axis size); params are replicated; each shard derives its own PRNG
    stream by folding in its data-axis index. Returns (audio, sequences)
    sharded the same way.
    """
    inner = generate_fn(params, cfg, compute_dtype=compute_dtype,
                        use_pallas=use_pallas, pallas_opts=pallas_opts,
                        temperature=temperature)

    def shard_body(cond, spk, key):
        idx = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, idx)
        return inner(cond, spk, key)

    spec_b = P("data")
    fn = shard_map(
        shard_body, mesh=mesh,
        in_specs=(spec_b, spec_b, P()),
        out_specs=(spec_b, spec_b),
        check_rep=False,
    )
    return jax.jit(fn)


def sharded_generate_fn_dynamic(cfg: ModelConfig, mesh, compute_dtype=None,
                                use_pallas=False, pallas_opts=None,
                                temperature=1.0):
    """sharded_generate_fn with params as a CALL argument (replicated over
    the mesh): one XLA compile serves changing weights — the serving
    path's form (VocoderService uses it for /synthesize when a mesh is
    configured, so one server fans a request batch over a pod slice).

    Same contract as sharded_generate_fn: each shard folds its data-axis
    index into the key, so the sharded batch is defined as N independent
    local generators (see __graft_entry__.dryrun_multichip's note).
    """
    def shard_body(params, cond, spk, key):
        idx = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, idx)
        return generate_fn(params, cfg, compute_dtype, use_pallas,
                           pallas_opts, 1, temperature)(cond, spk, key)

    spec_b = P("data")
    fn = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), spec_b, spec_b, P()),
        out_specs=(spec_b, spec_b),
        check_rep=False,
    )
    return jax.jit(fn)


def sharded_streaming_fn(params, cfg: ModelConfig, mesh,
                         frames_per_push: int = 1, compute_dtype=None,
                         use_pallas=False, pallas_opts=None,
                         temperature=1.0):
    """Streaming push sharded over mesh axis 'data' (round 4): the
    multi-chip form of models.generate.streaming_fn, so a pod slice can
    carry one lane-batched stream state with lanes sharded across chips
    (the mux-over-mesh building block; SURVEY §5.8).

    Returns (init_state, push):
      init_state(spk (B,), [key]) -> carry with every batch-axis leaf
        sharded on 'data' (B must divide by the data-axis size); the
        carried PRNG key gains a leading shard axis (one key per shard).
      push(carry, cond (B, C) or (B, K, C)) -> (carry, audio, samples)
        sharded the same way.

    Contract (same as sharded_generate_fn): each shard folds its
    data-axis index into the init key, so the sharded stream is defined
    as N independent local streams over the batch shards — per-shard
    equality against local streaming_fn pushes with the folded key is
    exact (asserted in tests/test_parallel.py).
    """
    from msnv_tpu.models.generate import streaming_fn

    init_local, push_local = streaming_fn(
        params, cfg, compute_dtype=compute_dtype, use_pallas=use_pallas,
        pallas_opts=pallas_opts, frames_per_push=frames_per_push,
        temperature=temperature)

    # carry = (spk_vec (B,D), buf (B,lookback), hs tuple of (n_rnn,B,D),
    #          key (+lead shard axis))
    hs_spec = tuple(P(None, "data") for _ in params["tiers"])
    carry_specs = (P("data"), P("data"), hs_spec, P("data"))

    def init_body(spk, key):
        idx = jax.lax.axis_index("data")
        spk_vec, buf, hs, k = init_local(
            spk.shape[0], spk, jax.random.fold_in(key, idx))
        return spk_vec, buf, hs, k[None]

    init_fn = jax.jit(shard_map(
        init_body, mesh=mesh, in_specs=(P("data"), P()),
        out_specs=carry_specs, check_rep=False))

    def push_body(spk_vec, buf, hs, key, cond):
        carry2, audio, samples = push_local(
            (spk_vec, buf, hs, key[0]), cond)
        s2, b2, h2, k2 = carry2
        return s2, b2, h2, k2[None], audio, samples

    push_fn = jax.jit(shard_map(
        push_body, mesh=mesh, in_specs=carry_specs + (P("data"),),
        out_specs=carry_specs + (P("data"), P("data")),
        check_rep=False))

    def init_state(spk, key=None):
        shards = int(mesh.shape["data"])
        b = int(spk.shape[0])
        assert b % shards == 0, (
            f"stream batch {b} must divide by the mesh 'data' axis size "
            f"{shards} (each shard carries B/shards lanes)")
        if key is None:
            key = jax.random.PRNGKey(0)
        return tuple(init_fn(spk, key))

    def push(carry, cond):
        spk_vec, buf, hs, key, audio, samples = push_fn(*carry, cond)
        return (spk_vec, buf, hs, key), audio, samples

    return init_state, push
