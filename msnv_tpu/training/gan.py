"""Adversarial (samplernn-gan) training step: two optimizers, lambda ramp.

Semantics (ref doc/Barbany_report.pdf §3.2.2 + run_samplegan.sh
--lambda_weight 0 0.01 50000, via SURVEY.md §2.8):

- L1 = vocoder NLL (bits); L2 = discriminator speaker-classification NLL on
  the conditioner latent.
- discriminator optimizer minimizes L2 over discriminator params only
  (latent stop-gradiented — the vocoder must not help the classifier);
- main optimizer minimizes L = L1 - lambda * L2 over SampleRNN +
  ConditionerCNN params (gradient REVERSAL through the latent: the
  conditioner learns to strip speaker identity);
- lambda ramps linearly start -> target over ramp_steps, then stays.

Both updates run in ONE jitted step; the step index drives the ramp.

Adaptive lambda (cfg.lambda_adaptive = (target_nll, gain, max_mult); no
reference analogue): the ramped lambda is additionally scaled by
exp(gain * (target_nll - L2)), clipped to [1/max_mult, max_mult]. L2 is
available BEFORE lambda is applied (the shared discriminator backward
computes it first), so the controller is stateless — nothing new in the
carry, and the tensor/indexed/block-scan forms and checkpoints are
untouched. Motivation: docs/VOICE_CONVERSION.md "round 5" — at the
converged schedule a fixed lambda lets the in-loop discriminator NLL
collapse to ~0, its latent gradient saturates, and conversion decays;
holding L2 near a target keeps the reversal pressure alive.

Like the identity-variant path (training/step.py), the step comes in three
forms sharing one core: tensor-argument (`make_gan_train_step`), indexed
over a device-resident corpus (`make_gan_train_step_indexed`), and a
multi-chunk `lax.scan` executable (`make_gan_train_block_scan`). All three
accept a device mesh: vocoder params dp-replicated/tp-sharded
(parallel/mesh.param_sharding), discriminator + both optimizer states
replicated, batch-like inputs sharded over 'data' — XLA inserts the
gradient psums for BOTH optimizers, so the same step runs 1 chip -> pod.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from msnv_tpu.config import ModelConfig, TrainConfig
from msnv_tpu.models.discriminator import discriminator_nll
from msnv_tpu.models.samplernn import predictor_apply
from msnv_tpu.ops.xent import nll_bits_from_logits
from msnv_tpu.training.step import (
    chunk_slices, freeze_h0_grads, state_stop_gradient,
)


def lambda_ramp(cfg: TrainConfig, step):
    start, target, ramp_steps = cfg.lambda_weight
    frac = jnp.clip(step / jnp.maximum(ramp_steps, 1.0), 0.0, 1.0)
    return start + (target - start) * frac


def _make_gan_core(model_cfg: ModelConfig, train_cfg: TrainConfig,
                   main_opt, disc_opt, compute_dtype):
    """Un-jitted two-optimizer step body, shared by the tensor-argument,
    indexed, and block-scan entry points.

    core(params, disc_params, main_opt_state, disc_opt_state, state,
         step_idx, data, reset, target, cond, spk)
      -> (params, disc_params, main_opt_state, disc_opt_state, state,
          {"loss": L1_bits, "disc_loss": L2, "lambda": lam})
    """
    assert model_cfg.variant == "gan", model_cfg.variant
    # the discriminator follows the vocoder's mixed-precision choice: bf16
    # conv operands halve HBM traffic on the (B, 13, 50, 512) maps while
    # InstanceNorm statistics / classifier logits stay f32 (discriminator.py)
    disc_dtype = compute_dtype

    def forward(params, state, data, reset, cond, spk):
        if compute_dtype is not None:
            from msnv_tpu.models.generate import cast_float_tree
            params = cast_float_tree(params, compute_dtype)
            state = [s.astype(compute_dtype) for s in state]
        logits, new_state, latent = predictor_apply(
            params, model_cfg, data, reset, cond, spk, state,
            output="logits")
        new_state = [s.astype(jnp.float32) for s in new_state]
        # the discriminator stays f32 (InstanceNorm statistics); under bf16
        # mixed precision the latent must be upcast before its convs —
        # lax.conv rejects mixed bf16/f32 operands
        return logits, new_state, latent.astype(jnp.float32)

    def disc_loss(disc_params, latent, spk):
        if disc_dtype is not None:
            # bf16 discriminator convs; InstanceNorm statistics and the
            # classifier logits stay f32 inside discriminator_apply. Casting
            # INSIDE the differentiated fn keeps grads in f32 master dtype.
            from msnv_tpu.models.generate import cast_float_tree
            disc_params = cast_float_tree(disc_params, disc_dtype)
            latent = latent.astype(disc_dtype)
        return discriminator_nll(disc_params, latent, spk)

    def core(params, disc_params, main_opt_state, disc_opt_state, state,
             step_idx, data, reset, target, cond, spk):
        lam = lambda_ramp(train_cfg, step_idx)

        # One vocoder forward (vjp), one discriminator forward, and ONE
        # shared discriminator backward. The naive two-loss formulation
        # (grad of L1 - lam*L2 wrt vocoder params, then grad of L2 wrt disc
        # params) runs the discriminator dgrad chain TWICE — both backward
        # passes traverse the same activations with cotangents that differ
        # only by the scalar -lam. The dgrad chain is linear in the
        # cotangent, so we compute d(L2)/d(disc_params, latent) once and
        # feed -lam * dL2/dlatent into the vocoder vjp. Saves one full
        # discriminator forward + one dgrad chain (~7.6 of ~19 TFLOP at the
        # ref config) with bit-identical update semantics: both optimizers
        # still see gradients evaluated at the pre-update parameters.
        def fwd(p):
            logits, new_state, latent = forward(p, state, data, reset,
                                                cond, spk)
            return (logits, latent), new_state
        (logits, latent), f_vjp, new_state = jax.vjp(fwd, params,
                                                     has_aux=True)
        l1, nll_vjp = jax.vjp(
            lambda lg: nll_bits_from_logits(lg, target), logits)
        l2, (d_grads, g_latent) = jax.value_and_grad(
            disc_loss, argnums=(0, 1))(disc_params, latent, spk)

        if train_cfg.lambda_adaptive is not None:
            target_nll, gain, max_mult = train_cfg.lambda_adaptive
            mult = jnp.exp(gain * (target_nll - l2))
            lam = lam * jnp.clip(mult, 1.0 / max_mult, max_mult)

        (dlogits,) = nll_vjp(jnp.ones_like(l1))
        (grads,) = f_vjp((dlogits, (-lam) * g_latent))
        grads = freeze_h0_grads(model_cfg, grads)
        updates, main_opt_state = main_opt.update(grads, main_opt_state,
                                                  params)
        params = optax.apply_updates(params, updates)

        d_updates, disc_opt_state = disc_opt.update(d_grads, disc_opt_state,
                                                    disc_params)
        disc_params = optax.apply_updates(disc_params, d_updates)

        metrics = {"loss": l1, "disc_loss": l2, "lambda": lam}
        return (params, disc_params, main_opt_state, disc_opt_state,
                state_stop_gradient(new_state), metrics)

    return core


def _gan_shardings(mesh, params_template, disc_template, main_opt_template,
                   disc_opt_template, state_template):
    """(p_sh, d_sh, mo_sh, do_sh, s_sh, b, rep) for the GAN step family.

    Vocoder params follow param_sharding (replicated over 'data', wide
    weights over 'model'); the discriminator — small vs the vocoder and
    convolutional — is fully replicated, as are both Adam states."""
    from msnv_tpu.parallel.mesh import (
        batch_sharding, param_sharding, replicated, state_sharding,
    )
    rep = replicated(mesh)
    p_sh = param_sharding(mesh, params_template)
    d_sh = jax.tree_util.tree_map(lambda _: rep, disc_template)
    mo_sh = jax.tree_util.tree_map(lambda _: rep, main_opt_template)
    do_sh = jax.tree_util.tree_map(lambda _: rep, disc_opt_template)
    s_sh = [state_sharding(mesh) for _ in state_template]
    b = batch_sharding(mesh)
    return p_sh, d_sh, mo_sh, do_sh, s_sh, b, rep


_METRICS = ("loss", "disc_loss", "lambda")


def make_gan_train_step(model_cfg: ModelConfig, train_cfg: TrainConfig,
                        main_opt, disc_opt, mesh=None, donate=False,
                        compute_dtype=None):
    """Jitted two-optimizer step:

    step(params, disc_params, main_opt_state, disc_opt_state, state,
         step_idx, data, reset, target, cond, spk)
      -> (params, disc_params, main_opt_state, disc_opt_state, state,
          {"loss": L1_bits, "disc_loss": L2, "lambda": lam})

    With a mesh, returns a builder(params_t, disc_t, main_opt_t, disc_opt_t,
    state_t) like training/step.make_train_step.
    """
    core = _make_gan_core(model_cfg, train_cfg, main_opt, disc_opt,
                          compute_dtype)
    kwargs = {"donate_argnums": (0, 1, 2, 3, 4)} if donate else {}
    if mesh is None:
        return jax.jit(core, **kwargs)

    def jit_with_shardings(params_t, disc_t, main_opt_t, disc_opt_t,
                           state_t):
        p_sh, d_sh, mo_sh, do_sh, s_sh, b, rep = _gan_shardings(
            mesh, params_t, disc_t, main_opt_t, disc_opt_t, state_t)
        m_sh = {k: rep for k in _METRICS}
        return jax.jit(
            core,
            in_shardings=(p_sh, d_sh, mo_sh, do_sh, s_sh, rep,
                          b, rep, b, b, b),
            out_shardings=(p_sh, d_sh, mo_sh, do_sh, s_sh, m_sh),
            **kwargs,
        )

    return jit_with_shardings


def make_gan_train_step_indexed(model_cfg: ModelConfig,
                                train_cfg: TrainConfig, main_opt, disc_opt,
                                seq_len: int, overlap_len: int,
                                cond_in_seq: int, donate=True,
                                compute_dtype=None):
    """Indexed GAN step over a device-resident corpus:

    step(params, disc_params, main_opt_state, disc_opt_state, state,
         step_idx, corpus, k) -> (..., metrics)

    Numerically identical to make_gan_train_step on host-sliced tensors
    (training/step.chunk_slices is exact); removes the per-step
    host->device chunk upload.
    """
    core = _make_gan_core(model_cfg, train_cfg, main_opt, disc_opt,
                          compute_dtype)

    def step(params, disc_params, main_opt_state, disc_opt_state, state,
             step_idx, corpus, k):
        data, reset, target, cond, spk = chunk_slices(
            corpus, k, seq_len, overlap_len, cond_in_seq)
        return core(params, disc_params, main_opt_state, disc_opt_state,
                    state, step_idx, data, reset, target, cond, spk)

    kwargs = {"donate_argnums": (0, 1, 2, 3, 4)} if donate else {}
    return jax.jit(step, **kwargs)


def make_gan_train_block_scan(model_cfg: ModelConfig,
                              train_cfg: TrainConfig, main_opt, disc_opt,
                              seq_len: int, overlap_len: int,
                              cond_in_seq: int, mesh=None, donate=True,
                              compute_dtype=None):
    """Multi-step GAN executable over a device-resident corpus:

    run_block(params, disc_params, main_opt_state, disc_opt_state, state,
              step_idx0, corpus, ks (B,))
      -> (params, disc_params, main_opt_state, disc_opt_state, state,
          {"loss": (B,), "disc_loss": (B,), "lambda": (B,)})

    A `lax.scan` of the two-optimizer step over a block of chunk indices —
    ONE dispatch and ONE metrics fetch per block. The lambda-ramp step
    index advances inside the scan (step_idx0 + position), so the ramp is
    identical to B sequential steps.

    With a mesh, returns a builder(params_t, disc_t, main_opt_t,
    disc_opt_t, state_t): corpus lanes sharded over 'data', indices and
    metrics replicated.
    """
    core = _make_gan_core(model_cfg, train_cfg, main_opt, disc_opt,
                          compute_dtype)

    def run_block(params, disc_params, main_opt_state, disc_opt_state,
                  state, step_idx0, corpus, ks):
        def body(carry, k):
            (params, disc_params, main_opt_state, disc_opt_state, state,
             step_idx) = carry
            data, reset, target, cond, spk = chunk_slices(
                corpus, k, seq_len, overlap_len, cond_in_seq)
            (params, disc_params, main_opt_state, disc_opt_state, state,
             metrics) = core(params, disc_params, main_opt_state,
                             disc_opt_state, state, step_idx, data, reset,
                             target, cond, spk)
            carry = (params, disc_params, main_opt_state, disc_opt_state,
                     state, step_idx + 1.0)
            return carry, metrics

        (params, disc_params, main_opt_state, disc_opt_state, state,
         _), metrics = jax.lax.scan(
            body,
            (params, disc_params, main_opt_state, disc_opt_state, state,
             step_idx0), ks)
        return (params, disc_params, main_opt_state, disc_opt_state, state,
                metrics)

    kwargs = {"donate_argnums": (0, 1, 2, 3, 4)} if donate else {}
    if mesh is None:
        return jax.jit(run_block, **kwargs)

    from msnv_tpu.parallel.mesh import corpus_sharding

    def jit_with_shardings(params_t, disc_t, main_opt_t, disc_opt_t,
                           state_t):
        p_sh, d_sh, mo_sh, do_sh, s_sh, b, rep = _gan_shardings(
            mesh, params_t, disc_t, main_opt_t, disc_opt_t, state_t)
        c_sh = corpus_sharding(mesh)
        m_sh = {k: rep for k in _METRICS}
        return jax.jit(
            run_block,
            in_shardings=(p_sh, d_sh, mo_sh, do_sh, s_sh, rep, c_sh, rep),
            out_shardings=(p_sh, d_sh, mo_sh, do_sh, s_sh, m_sh),
            **kwargs,
        )

    return jit_with_shardings
