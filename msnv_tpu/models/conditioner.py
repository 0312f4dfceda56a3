"""Conditioner heads: identity / bottleneck / GAN ConditionerCNN.

The reference's two voice-conversion variants replace the top tier's single
`cond_expand` projection with a configurable stack (ref doc/Barbany_report.pdf
sections 3.2.1-3.2.2; run_sampleneck.sh / run_samplegan.sh):

- "identity":   cond (B,T,C) -> dense C->dim           (ref model.py:92-100)
- "bottleneck": narrowing 1x1-conv stack C->40->30->20->ind_cond_dim->dim,
                forcing a low-dim speaker-independent code (thesis fig 3.4)
- "gan":        ConditionerCNN C->C->C->ind_cond_dim producing a latent that
                both feeds the vocoder (after expansion to dim) and is
                adversarially classified by a speaker discriminator
                (thesis fig 3.5)

All stacks are dense layers (Conv1d k=1 equivalents) applied per frame.
Intermediate activations are ReLU (the thesis does not specify; documented
design choice), final expansion linear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msnv_tpu.ops.linear import dense_init, dense_apply, kaiming_uniform


def conditioner_init(key, cfg, dtype=jnp.float32):
    """Params for the conditioner head given a ModelConfig."""
    c = cfg.effective_cond_dim
    wn = cfg.weight_norm
    if cfg.variant == "identity":
        return {"expand": dense_init(key, c, cfg.dim, init=kaiming_uniform,
                                     weight_norm=wn, dtype=dtype)}
    if cfg.variant == "bottleneck":
        dims = [c, 40, 30, 20, cfg.ind_cond_dim]
        keys = jax.random.split(key, len(dims))
        stack = [dense_init(k, dims[i], dims[i + 1], init=kaiming_uniform,
                            weight_norm=wn, dtype=dtype)
                 for i, k in enumerate(keys[:-1])]
        return {"stack": stack,
                "expand": dense_init(keys[-1], cfg.ind_cond_dim, cfg.dim,
                                     init=kaiming_uniform, weight_norm=wn,
                                     dtype=dtype)}
    if cfg.variant == "gan":
        dims = [c, c, c, cfg.ind_cond_dim]
        keys = jax.random.split(key, len(dims))
        stack = [dense_init(k, dims[i], dims[i + 1], init=kaiming_uniform,
                            weight_norm=wn, dtype=dtype)
                 for i, k in enumerate(keys[:-1])]
        return {"stack": stack,
                "expand": dense_init(keys[-1], cfg.ind_cond_dim, cfg.dim,
                                     init=kaiming_uniform, weight_norm=wn,
                                     dtype=dtype)}
    raise ValueError(f"unknown variant {cfg.variant!r}")


def conditioner_apply(params, cfg, cond):
    """cond (B, T, C) -> (expanded (B, T, dim), latent (B, T, *) or None).

    `latent` is the speaker-independent code fed to the GAN discriminator
    (None for the identity head).
    """
    if cfg.variant == "identity":
        return dense_apply(params["expand"], cond), None
    x = cond
    stack = params["stack"]
    for i, layer in enumerate(stack):
        x = dense_apply(layer, x)
        if i < len(stack) - 1:
            x = jax.nn.relu(x)
    latent = x
    return dense_apply(params["expand"], latent), latent
