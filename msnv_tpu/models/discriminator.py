"""Speaker discriminator for the samplernn-gan variant.

Architecture from the thesis (ref doc/Barbany_report.pdf §3.2.2 + fig 3.5,
via SURVEY.md §2.8): the speaker-independent conditioner latent map,
reshaped to a (B, 13, ind_cond_dim, 1) image, passes through 4 residual
blocks of

  [ReflectionPad 2x2 -> Conv2d 5x5 (1->512, then 512->512) -> LeakyReLU
   -> ReflectionPad 2x2 -> Conv2d 5x5 -> InstanceNorm2d(512)]

with additive skip connections, then a classifier emits per-speaker
log-probs; its NLL (L2) is minimized by the discriminator optimizer and
subtracted (weighted by the ramped lambda) from the vocoder loss
(ref run_samplegan.sh --lambda_weight 0 0.01 50000).

Documented design choices where the thesis under-specifies:
- the first block's skip is identity only when channel counts match, so
  block 1 (1->512) has no skip; blocks 2-4 do
- InstanceNorm is non-affine (torch's InstanceNorm2d default)
- the classifier is LeakyReLU -> global-mean-pool -> dense -> log_softmax
  (the activation before pooling matters: instance-normalized maps are
  zero-mean, so a bare mean-pool would be identically zero)
- LeakyReLU slope 0.2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msnv_tpu.ops.linear import dense_init, dense_apply, kaiming_uniform

N_BLOCKS = 4
CHANNELS = 512
KERNEL = 5
PAD = 2
LEAK = 0.2


def _conv_init(key, in_ch, out_ch, bias=True, dtype=jnp.float32):
    # HWIO layout for lax.conv_general_dilated with NHWC
    p = {
        "w": kaiming_uniform(key, (KERNEL, KERNEL, in_ch, out_ch),
                             fan_in=KERNEL * KERNEL * in_ch, dtype=dtype),
    }
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype)
    return p


def discriminator_init(key, spk_dim: int, channels: int = CHANNELS,
                       dtype=jnp.float32):
    blocks = []
    in_ch = 1
    for _ in range(N_BLOCKS):
        key, k1, k2 = jax.random.split(key, 3)
        blocks.append({
            "conv1": _conv_init(k1, in_ch, channels, dtype=dtype),
            # no bias on the pre-norm conv: InstanceNorm subtracts the
            # per-map mean, so a conv2 bias is a dead parameter whose
            # exactly-zero gradient Adam would amplify from FP noise into
            # arbitrary-direction steps (breaks sharded==single-device)
            "conv2": _conv_init(k2, channels, channels, bias=False,
                                dtype=dtype),
        })
        in_ch = channels
    key, k_out = jax.random.split(key)
    return {
        "blocks": blocks,
        "classifier": dense_init(k_out, channels, spk_dim, dtype=dtype),
    }


def _reflect_pad(x):
    return jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)),
                   mode="reflect")


def _conv(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y + p["b"] if "b" in p else y


def _instance_norm(x, eps: float = 1e-5):
    """Non-affine InstanceNorm2d: normalize each (sample, channel) map.

    Statistics are always computed in f32: under bf16 mixed precision the
    mean/variance of a 13x50 map would otherwise lose ~3 decimal digits,
    and rsqrt(var) amplifies that into the normalized activations."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def discriminator_apply(params, latent):
    """latent (B, T, ind_cond_dim) -> per-speaker log-probs (B, spk_dim)."""
    x = latent[..., None]                       # (B, T, C_lat, 1) as NHWC
    for block in params["blocks"]:
        y = _conv(block["conv1"], _reflect_pad(x))
        y = jax.nn.leaky_relu(y, LEAK)
        y = _conv(block["conv2"], _reflect_pad(y))
        y = _instance_norm(y)
        x = y + x if x.shape[-1] == y.shape[-1] else y
    # pool + classify in f32: the log-softmax normalizer must not be
    # quantized to bf16 (the NLL difference L2 drives the lambda reversal)
    pooled = jnp.mean(jax.nn.leaky_relu(x, LEAK).astype(jnp.float32),
                      axis=(1, 2))                               # (B, C)
    cls = jax.tree_util.tree_map(lambda p: p.astype(jnp.float32),
                                 params["classifier"])
    logits = dense_apply(cls, pooled)
    return jax.nn.log_softmax(logits, axis=-1)


def discriminator_nll(params, latent, spk):
    """Speaker-classification NLL (the L2 term), in nats."""
    log_probs = discriminator_apply(params, latent)
    return -jnp.mean(jnp.take_along_axis(log_probs, spk[:, None], axis=-1))
