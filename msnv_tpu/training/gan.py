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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from msnv_tpu.config import ModelConfig, TrainConfig
from msnv_tpu.models.discriminator import discriminator_nll
from msnv_tpu.models.samplernn import predictor_apply
from msnv_tpu.ops.xent import nll_bits_from_logits
from msnv_tpu.training.step import state_stop_gradient


def lambda_ramp(cfg: TrainConfig, step):
    start, target, ramp_steps = cfg.lambda_weight
    frac = jnp.clip(step / jnp.maximum(ramp_steps, 1.0), 0.0, 1.0)
    return start + (target - start) * frac


def make_gan_train_step(model_cfg: ModelConfig, train_cfg: TrainConfig,
                        main_opt, disc_opt, compute_dtype=None):
    """Returns jitted step:

    step(params, disc_params, main_opt_state, disc_opt_state, state,
         step_idx, data, reset, target, cond, spk)
      -> (params, disc_params, main_opt_state, disc_opt_state, state,
          {"loss": L1_bits, "disc_loss": L2, "lambda": lam})
    """
    assert model_cfg.variant == "gan", model_cfg.variant

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

    def main_loss(params, disc_params, state, data, reset, cond, spk,
                  target, lam):
        logits, new_state, latent = forward(params, state, data, reset,
                                             cond, spk)
        l1 = nll_bits_from_logits(logits, target)
        # adversarial term: vocoder params get -lam * dL2/dparams via latent
        l2 = discriminator_nll(disc_params, latent, spk)
        return l1 - lam * l2, (new_state, l1, latent)

    def disc_loss(disc_params, latent, spk):
        return discriminator_nll(disc_params, latent, spk)

    @jax.jit
    def step(params, disc_params, main_opt_state, disc_opt_state, state,
             step_idx, data, reset, target, cond, spk):
        lam = lambda_ramp(train_cfg, step_idx)

        from msnv_tpu.training.step import freeze_h0_grads
        grads, (new_state, l1, latent) = jax.grad(
            main_loss, has_aux=True)(params, disc_params, state, data,
                                     reset, cond, spk, target, lam)
        grads = freeze_h0_grads(model_cfg, grads)
        updates, main_opt_state = main_opt.update(grads, main_opt_state,
                                                  params)
        params = optax.apply_updates(params, updates)

        # discriminator trains on the (detached) latent
        latent_sg = jax.lax.stop_gradient(latent)
        l2, d_grads = jax.value_and_grad(disc_loss)(disc_params, latent_sg,
                                                    spk)
        d_updates, disc_opt_state = disc_opt.update(d_grads, disc_opt_state,
                                                    disc_params)
        disc_params = optax.apply_updates(disc_params, d_updates)

        metrics = {"loss": l1, "disc_loss": l2, "lambda": lam}
        return (params, disc_params, main_opt_state, disc_opt_state,
                state_stop_gradient(new_state), metrics)

    return step
