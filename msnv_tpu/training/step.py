"""Jitted TBPTT train/eval steps, optionally sharded over a device mesh.

Replaces the reference's closure-style optimizer.step path (ref
trainer/__init__.py:62-117 + optim.py:4-21) with a single compiled function:
forward -> NLL-bits loss -> grad -> element-wise clip -> Adam -> new params,
with the TBPTT hidden state threaded through as a donated argument.

With a mesh: batch-like inputs (data/target/cond/spk, hidden state) are
sharded along 'data'; params/opt-state replicated over 'data' (and
tensor-sharded over 'model' when that axis is >1). XLA inserts the gradient
psum over ICI — the same step runs on 1 chip or an N-host pod slice.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.samplernn import (
    predictor_apply, sequence_nll_loss_bits,
)
from msnv_tpu.ops.xent import nll_bits_from_logits
from msnv_tpu.parallel.mesh import (
    batch_sharding, param_sharding, replicated, state_sharding,
)


def exposure_tuple(train_cfg) -> Optional[tuple]:
    """(ss_prob, input_noise_prob, input_noise_levels) when exposure-bias
    mitigation is enabled in a TrainConfig, else None."""
    if train_cfg is None:
        return None
    if train_cfg.ss_prob <= 0.0 and train_cfg.input_noise_prob <= 0.0:
        return None
    return (float(train_cfg.ss_prob), float(train_cfg.input_noise_prob),
            int(train_cfg.input_noise_levels))


def _make_step_core(cfg: ModelConfig, optimizer, compute_dtype,
                    exposure: Optional[tuple] = None):
    """The un-jitted train step body, shared by the tensor-argument and
    the indexed (device-resident corpus) entry points.

    With `exposure` = (ss_prob, noise_prob, noise_levels) the returned
    step takes ONE extra trailing `key` argument and perturbs the TBPTT
    inputs before the loss forward (config.TrainConfig.ss_prob docs):
    scheduled sampling replaces input samples past the lookback seed
    with the model's own teacher-forced predictions with prob ss_prob
    (the parallel two-pass form — one extra forward, no sequential
    loop), and input noise jitters input levels with prob noise_prob.
    Targets are always the clean ground truth; eval is untouched.
    """

    def loss_fn(params, state, data, reset, cond, spk, target):
        if compute_dtype is not None:
            from msnv_tpu.models.generate import cast_float_tree
            p = cast_float_tree(params, compute_dtype)
            state = [s.astype(compute_dtype) for s in state]
        else:
            p = params
        # logits + fused NLL (ops/xent.py): same value as log_softmax +
        # gather (ref nn.py:66-70), without materializing the log-prob
        # array or a scatter in the backward.
        logits, new_state, _latent = predictor_apply(
            p, cfg, data, reset, cond, spk, state, output="logits")
        loss = nll_bits_from_logits(logits, target)
        return loss, [s.astype(jnp.float32) for s in new_state]

    def step(params, opt_state, state, data, reset, target, cond, spk):
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, data, reset, cond, spk,
                                   target)
        grads = freeze_h0_grads(cfg, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, state_stop_gradient(new_state), loss

    if exposure is None:
        return step

    ss_prob, noise_prob, noise_levels = exposure
    lb = cfg.lookback

    def perturb(params, state, data, reset, cond, spk, key):
        if noise_prob > 0.0:
            key, kf, kj = jax.random.split(key, 3)
            flip = jax.random.bernoulli(kf, noise_prob, data.shape)
            jitter = jax.random.randint(kj, data.shape, -noise_levels,
                                        noise_levels + 1)
            data = jnp.where(
                flip, jnp.clip(data + jitter, 0, cfg.q_levels - 1), data)
        if ss_prob > 0.0:
            key, ks, km = jax.random.split(key, 3)
            if compute_dtype is not None:
                from msnv_tpu.models.generate import cast_float_tree
                p = cast_float_tree(params, compute_dtype)
                st = [s.astype(compute_dtype) for s in state]
            else:
                p, st = params, state
            logits, _, _ = predictor_apply(
                p, cfg, data, reset, cond, spk, st, output="logits")
            # logits[:, t] predicts target t, which sits at input
            # position lb + t; the LAST target is outside the input
            # window, so only samples[:, :-1] are candidates
            samples = jax.random.categorical(
                ks, logits.astype(jnp.float32), axis=-1).astype(data.dtype)
            mix = jax.random.bernoulli(km, ss_prob,
                                       samples[:, :-1].shape)
            tail = jnp.where(mix, samples[:, :-1], data[:, lb:])
            data = jnp.concatenate([data[:, :lb], tail], axis=1)
        return jax.lax.stop_gradient(data)

    def step_exposure(params, opt_state, state, data, reset, target,
                      cond, spk, key):
        data = perturb(params, state, data, reset, cond, spk, key)
        return step(params, opt_state, state, data, reset, target, cond,
                    spk)

    return step_exposure


def chunk_slices(corpus, k, seq_len: int, overlap_len: int,
                 cond_in_seq: int):
    """In-jit equivalent of data/loader.ChunkLoader.get_chunk(k) over the
    device-resident packed corpus (loader.device_arrays()): dynamic slices
    by a TRACED chunk index, so one executable serves every chunk and no
    per-step tensors cross the host->device boundary."""
    start = k * seq_len
    data = jax.lax.dynamic_slice_in_dim(
        corpus["qdata"], start, seq_len + overlap_len - 1, axis=1)
    target = jax.lax.dynamic_slice_in_dim(
        corpus["qdata"], start + overlap_len, seq_len, axis=1)
    # one-frame cond offset (ref dataset.py:261-266)
    cond = jax.lax.dynamic_slice_in_dim(
        corpus["cond"], k * cond_in_seq + 1, cond_in_seq, axis=1)
    spk = jax.lax.dynamic_index_in_dim(corpus["spk"], k, axis=0,
                                       keepdims=False)
    return data, k == 0, target, cond, spk


def make_train_step_indexed(cfg: ModelConfig, optimizer, seq_len: int,
                            overlap_len: int, cond_in_seq: int,
                            donate=True, compute_dtype=None,
                            exposure: Optional[tuple] = None):
    """Indexed train step for device-resident corpora:

    step(params, opt_state, state, corpus, k[, key])
      -> (params, opt_state, state, loss_bits)

    Numerically identical to make_train_step on the host-sliced tensors
    (the slicing is exact); wall-clock it removes the per-step
    host->device chunk upload — the dominant cost of the tensor-argument
    loop on hosts with slow interconnect to the accelerator.

    With `exposure` the step takes a trailing base `key`; the chunk
    index is folded in, so one per-epoch key gives every chunk its own
    randomness.
    """
    core = _make_step_core(cfg, optimizer, compute_dtype, exposure)

    if exposure is None:
        def step(params, opt_state, state, corpus, k):
            data, reset, target, cond, spk = chunk_slices(
                corpus, k, seq_len, overlap_len, cond_in_seq)
            return core(params, opt_state, state, data, reset, target,
                        cond, spk)
    else:
        def step(params, opt_state, state, corpus, k, key):
            data, reset, target, cond, spk = chunk_slices(
                corpus, k, seq_len, overlap_len, cond_in_seq)
            return core(params, opt_state, state, data, reset, target,
                        cond, spk, jax.random.fold_in(key, k))

    kwargs = {"donate_argnums": (0, 1, 2)} if donate else {}
    return jax.jit(step, **kwargs)


def make_train_block_scan(cfg: ModelConfig, optimizer, seq_len: int,
                          overlap_len: int, cond_in_seq: int,
                          mesh=None, donate=True, compute_dtype=None,
                          exposure: Optional[tuple] = None):
    """Multi-step train executable over a device-resident corpus:

    run_block(params, opt_state, state, corpus, ks (B,)[, key])
      -> (params, opt_state, state, losses (B,))

    A `lax.scan` of the train step over a block of chunk indices — ONE
    dispatch and ONE loss fetch per block instead of per step, which is
    what actually closes the gap to the compiled step time when the host
    sits behind a high-latency accelerator link. Numerically identical to
    B sequential indexed steps (same slices, same math, same order).

    With `exposure`, takes a trailing base `key` (chunk index folded in
    per scan step — matches the indexed form exactly). With a mesh,
    returns a builder(params_t, opt_t, state_t) like make_train_step:
    corpus lanes sharded over 'data' (parallel/mesh.corpus_sharding),
    indices replicated.
    """
    core = _make_step_core(cfg, optimizer, compute_dtype, exposure)

    def run_block(params, opt_state, state, corpus, ks, *keys):
        def body(carry, k):
            params, opt_state, state = carry
            data, reset, target, cond, spk = chunk_slices(
                corpus, k, seq_len, overlap_len, cond_in_seq)
            extra = ((jax.random.fold_in(keys[0], k),) if exposure
                     else ())
            params, opt_state, state, loss = core(
                params, opt_state, state, data, reset, target, cond, spk,
                *extra)
            return (params, opt_state, state), loss

        (params, opt_state, state), losses = jax.lax.scan(
            body, (params, opt_state, state), ks)
        return params, opt_state, state, losses

    kwargs = {"donate_argnums": (0, 1, 2)} if donate else {}
    if mesh is None:
        return jax.jit(run_block, **kwargs)

    from msnv_tpu.parallel.mesh import corpus_sharding
    c_sh = corpus_sharding(mesh)
    st = state_sharding(mesh)
    rep = replicated(mesh)

    def jit_with_shardings(params_template, opt_template, state_template):
        p_sh = param_sharding(mesh, params_template)
        o_sh = jax.tree_util.tree_map(lambda _: rep, opt_template)
        s_sh = [st for _ in state_template]
        extra_sh = (rep,) if exposure else ()
        return jax.jit(
            run_block,
            in_shardings=(p_sh, o_sh, s_sh, c_sh, rep) + extra_sh,
            out_shardings=(p_sh, o_sh, s_sh, rep),
            **kwargs,
        )

    return jit_with_shardings


def make_eval_block_scan(cfg: ModelConfig, seq_len: int, overlap_len: int,
                         cond_in_seq: int, mesh=None):
    """Multi-step eval executable over a device-resident corpus."""

    def run_block(params, state, corpus, ks):
        def body(state, k):
            data, reset, target, cond, spk = chunk_slices(
                corpus, k, seq_len, overlap_len, cond_in_seq)
            logits, state, _ = predictor_apply(
                params, cfg, data, reset, cond, spk, state,
                output="logits")
            return state, nll_bits_from_logits(logits, target)

        state, losses = jax.lax.scan(body, state, ks)
        return losses, state

    if mesh is None:
        return jax.jit(run_block)

    from msnv_tpu.parallel.mesh import corpus_sharding
    c_sh = corpus_sharding(mesh)
    st = state_sharding(mesh)
    rep = replicated(mesh)

    def jit_with_shardings(params_template, state_template):
        p_sh = param_sharding(mesh, params_template)
        s_sh = [st for _ in state_template]
        return jax.jit(run_block,
                       in_shardings=(p_sh, s_sh, c_sh, rep),
                       out_shardings=(rep, s_sh))

    return jit_with_shardings


def eval_device_corpus(cfg: ModelConfig, params, state, loader,
                       scan_block: int = 16):
    """One-shot block-scan evaluation over a freshly-uploaded device
    corpus -> (mean NLL bits, final state). Used by msnv-evaluate;
    Trainer.evaluate runs the same executables but caches the uploaded
    corpus and compiled scans across epochs (and handles mesh placement),
    so it keeps its own driver. The corpus buffers are released when this
    frame returns."""
    import numpy as np
    corpus_dev = loader.device_arrays()
    geo = (loader.seq_len, loader.overlap_len, loader.cond_in_seq)
    scan = make_eval_block_scan(cfg, *geo)
    ks = np.arange(len(loader), dtype=np.int32)
    n_full = (len(ks) // scan_block) * scan_block
    losses = []
    for i in range(0, n_full, scan_block):
        blk_losses, state = scan(params, state, corpus_dev,
                                 jnp.asarray(ks[i:i + scan_block]))
        losses.append(blk_losses)
    if n_full < len(ks):
        step_i = make_eval_step_indexed(cfg, *geo)
        for k in ks[n_full:]:
            loss, state = step_i(params, state, corpus_dev, np.int32(k))
            losses.append(loss[None])
    nll = float(jnp.concatenate(losses).mean()) if losses else 0.0
    return nll, state


def make_eval_step_indexed(cfg: ModelConfig, seq_len: int,
                           overlap_len: int, cond_in_seq: int):
    """Indexed eval step over a device-resident corpus."""

    def step(params, state, corpus, k):
        data, reset, target, cond, spk = chunk_slices(
            corpus, k, seq_len, overlap_len, cond_in_seq)
        logits, new_state, _ = predictor_apply(
            params, cfg, data, reset, cond, spk, state, output="logits")
        return nll_bits_from_logits(logits, target), new_state

    return jax.jit(step)


def make_train_step(cfg: ModelConfig, optimizer, mesh=None, donate=True,
                    compute_dtype=None, exposure: Optional[tuple] = None):
    """Build the jitted train step.

    step(params, opt_state, state, data, reset, target, cond, spk[, key])
      -> (params, opt_state, state, loss_bits)

    compute_dtype=jnp.bfloat16 enables mixed-precision training: f32 master
    params (Adam in f32), forward/backward matmuls in bf16 via a
    differentiable cast, loss/log-softmax in f32. `exposure` (see
    _make_step_core / config.TrainConfig.ss_prob) adds the trailing
    per-step PRNG key argument.
    """
    step = _make_step_core(cfg, optimizer, compute_dtype, exposure)

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0, 1, 2)
    if mesh is None:
        return jax.jit(step, **kwargs)

    def shard_like_params(template):
        return param_sharding(mesh, template)

    b = batch_sharding(mesh)
    st = state_sharding(mesh)
    rep = replicated(mesh)

    def jit_with_shardings(params_template, opt_template, state_template):
        p_sh = shard_like_params(params_template)
        o_sh = jax.tree_util.tree_map(lambda _: rep, opt_template)
        s_sh = [st for _ in state_template]
        extra_sh = (rep,) if exposure else ()
        return jax.jit(
            step,
            in_shardings=(p_sh, o_sh, s_sh, b, rep, b, b, b) + extra_sh,
            out_shardings=(p_sh, o_sh, s_sh, rep),
            **kwargs,
        )

    return jit_with_shardings


def state_stop_gradient(state):
    """TBPTT boundary: no grads flow into the carried state
    (ref model.py:348 `.detach()`)."""
    return jax.tree_util.tree_map(jax.lax.stop_gradient, state)


def freeze_h0_grads(cfg: ModelConfig, grads):
    """learn_h0=False: h0 is a fixed (zero) buffer like the reference's
    register_buffer path (ref model.py:79-83) — zero its gradients so the
    optimizer never moves it."""
    if cfg.learn_h0:
        return grads
    for tier in grads["tiers"]:
        tier["h0"] = jnp.zeros_like(tier["h0"])
    return grads


def make_eval_step(cfg: ModelConfig, mesh=None):
    """Jitted evaluation step: loss only, state threaded (used by the
    ValidationPlugin, ref trainer/plugins.py:51-92)."""

    def step(params, state, data, reset, target, cond, spk):
        logits, new_state, _ = predictor_apply(
            params, cfg, data, reset, cond, spk, state, output="logits")
        return nll_bits_from_logits(logits, target), new_state

    if mesh is None:
        return jax.jit(step)
    b = batch_sharding(mesh)
    st = state_sharding(mesh)
    rep = replicated(mesh)

    def jit_with_shardings(params_template, state_template):
        p_sh = param_sharding(mesh, params_template)
        s_sh = [st for _ in state_template]
        return jax.jit(step, in_shardings=(p_sh, s_sh, b, rep, b, b, b),
                       out_shardings=(rep, s_sh))

    return jit_with_shardings
