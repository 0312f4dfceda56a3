"""SampleRNN core: tiered frame-level GRUs + sample-level MLP, TPU-native.

Functional re-design of the reference model (ref model.py:18-436):
parameters are pytrees, the TBPTT-chunk forward (`predictor_apply`) is a pure
jittable function, and hidden state is an explicit pytree carried by the
caller (replacing the Python-side `Runner.hidden_states` dict,
ref model.py:328-349). `reset` is a traced boolean select against the learned
h0 — no Python control flow inside jit.

Shape walk for the canonical config (frame_sizes=(20,4), dim=1024,
seq_len=1040, B=128; ref model.py:183-194, 368-375, 430-432):

  top tier (nfs=80):  samples (B,1119)[0:-79]  -> (B,13,80) -> GRU -> (B,13,1024)
                      -> upsample x4            -> (B,52,1024)
  mid tier (nfs=20):  samples[60:-19]           -> (B,52,20) -> GRU
                      -> upsample x20           -> (B,1040,1024)
  sample MLP:         samples[60:] embedded, conv k=20 -> (B,1040,256) log-probs

Deliberate reference-quirk parity (each load-bearing for the allclose gate):
- tier inputs are `2 * dequantize(x)` (ref model.py:385-388)
- only the TOP tier is conditioned (ref model.py:46-47)
- speaker embedding is (spk_dim x spk_dim) and broadcast over frames
  (ref model.py:103-116, 208-218)
- the MLP input conv has no bias (ref model.py:279-285)
- loss is NLL converted to bits (ref nn.py:66-70)
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.conditioner import conditioner_init, conditioner_apply
from msnv_tpu.ops.gru import gru_init, gru_apply, gru_cell
from msnv_tpu.ops.qrnn import qrnn_init, qrnn_apply, qrnn_cell
from msnv_tpu.ops.linear import (
    dense_init, dense_apply, dense_weight, kaiming_uniform, lecun_uniform,
    normal,
)
from msnv_tpu.ops.embed_conv import embed_conv, embed_conv_direct
from msnv_tpu.ops.quantize import udequantize, linear_dequantize
from msnv_tpu.ops.upsample import upsample_init, upsample_apply


def dequantize(cfg: ModelConfig, x):
    """Selected dequantizer (ref model.py:29-32)."""
    if cfg.ulaw:
        return udequantize(x, cfg.q_levels)
    return linear_dequantize(x, cfg.q_levels)


# --------------------------------------------------------------------------
# Recurrent-cell dispatch: GRU (default) or fo-pool QRNN (cfg.qrnn).
# The reference's qrnn flag is dead (both branches build a GRU, ref
# model.py:133-153); here it selects a real QRNN (ops/qrnn.py). Both cells
# share the (n_layers, B, H) state layout, so everything downstream
# (TBPTT pytree, learned-h0 reset, checkpoints) is cell-agnostic.
# --------------------------------------------------------------------------

def rnn_init(cfg: ModelConfig, key, n_layers, in_dim, hidden,
             dtype=jnp.float32):
    init = qrnn_init if cfg.qrnn else gru_init
    return init(key, n_layers, in_dim, hidden, dtype=dtype)


def rnn_apply(cfg: ModelConfig, params, x, h0):
    if cfg.qrnn:
        return qrnn_apply(params, x, h0)
    return gru_apply(params, x, h0, impl=cfg.gru_impl)


def rnn_cell(cfg: ModelConfig, params, x, h):
    return (qrnn_cell if cfg.qrnn else gru_cell)(params, x, h)


# --------------------------------------------------------------------------
# Parameter initialization
# --------------------------------------------------------------------------

def init_params(key, cfg: ModelConfig, dtype=jnp.float32):
    """Build the full parameter pytree.

    Layout:
      {"tiers": [tier0(bottom) .. tierK(top)], "mlp": {...}}
    Each tier: {"h0", "input_expand", "gru", "upsample"} and, for the top
    tier only, {"conditioner", "spk_embedding", "spk_expand"}.
    """
    n_tiers = cfg.n_tiers
    tiers = []
    for t, (fs, nfs) in enumerate(zip(cfg.frame_sizes, cfg.ns_frame_samples)):
        key, k_in, k_up, k_gru, k_cond, k_spk_e, k_spk_x = jax.random.split(key, 7)
        is_top = t == n_tiers - 1
        tier = {
            # learned initial hidden state (ref model.py:79-83)
            "h0": jnp.zeros((cfg.n_rnn, cfg.dim), dtype),
            # frame-of-samples projection (ref model.py:85-89)
            "input_expand": dense_init(k_in, nfs, cfg.dim,
                                       init=kaiming_uniform,
                                       weight_norm=cfg.weight_norm,
                                       dtype=dtype),
            "gru": rnn_init(cfg, k_gru, cfg.n_rnn, cfg.dim, cfg.dim,
                            dtype=dtype),
            # expand tier output to the lower tier's frame rate
            # (ref model.py:167-178, nn.py:7-43)
            "upsample": upsample_init(k_up, cfg.dim, fs, cfg.dim,
                                      weight_norm=cfg.weight_norm, dtype=dtype),
        }
        if is_top:
            tier["conditioner"] = conditioner_init(k_cond, cfg, dtype=dtype)
            # speaker embedding table (spk_dim x spk_dim, N(0,1) like torch
            # Embedding; ref model.py:103-106) + expansion to dim
            tier["spk_embedding"] = normal(k_spk_e, (cfg.spk_dim, cfg.spk_dim),
                                           dtype)
            tier["spk_expand"] = dense_init(k_spk_x, cfg.spk_dim, cfg.dim,
                                            init=kaiming_uniform,
                                            weight_norm=cfg.weight_norm,
                                            dtype=dtype)
        tiers.append(tier)

    key, k_emb, k_conv, k_hid, k_out = jax.random.split(key, 5)
    fs0 = cfg.frame_sizes[0]
    q = cfg.q_levels
    mlp = {
        # sample embedding (q x q, ref model.py:274-277)
        "embedding": normal(k_emb, (q, q), dtype),
        # input conv k=fs0 over embedded samples, no bias
        # (ref model.py:279-285); layout (fs0, q, dim) = WIO for lax.conv
        "conv_in": kaiming_uniform(k_conv, (fs0, q, cfg.dim),
                                   fan_in=q * fs0, dtype=dtype),
        "hidden": dense_init(k_hid, cfg.dim, cfg.dim, init=kaiming_uniform,
                             weight_norm=cfg.weight_norm, dtype=dtype),
        "out": dense_init(k_out, cfg.dim, q, init=lecun_uniform,
                          weight_norm=cfg.weight_norm, dtype=dtype),
    }
    if cfg.weight_norm:
        # weight_norm on the input conv (dim=0 over out-channels in torch's
        # (dim, q, fs0) layout == our last axis)
        w = mlp["conv_in"]
        mlp["conv_in_g"] = jnp.sqrt(jnp.sum(w * w, axis=(0, 1)))
    return {"tiers": tiers, "mlp": mlp}


def init_tier_state(cfg: ModelConfig, batch_size: int, dtype=jnp.float32):
    """Zeroed TBPTT hidden-state pytree: one (n_rnn, B, dim) per tier.

    The actual learned h0 is substituted inside `predictor_apply` whenever
    `reset` is true, so the zero init here is only a placeholder container.
    """
    return [jnp.zeros((cfg.n_rnn, batch_size, cfg.dim), dtype)
            for _ in cfg.frame_sizes]


# --------------------------------------------------------------------------
# Forward pieces
# --------------------------------------------------------------------------

def _tier_forward(tier_params, cfg: ModelConfig, prev_frames, upper_cond,
                  cond, spk, hidden):
    """One frame-level tier (ref model.py:180-263).

    prev_frames: (B, T, nfs) dequantized+scaled sample frames.
    upper_cond:  (B, T, dim) upsampled upper-tier output, or None for top.
    cond:        (B, T, cond_dim_eff) for the top tier, else None.
    spk:         (B,) int speaker ids for the top tier, else None.
    hidden:      (n_rnn, B, dim).

    Returns (upsampled (B, T*frame_size, dim), new_hidden, latent_or_None).
    """
    x = dense_apply(tier_params["input_expand"], prev_frames)
    latent = None
    if upper_cond is not None:
        x = x + upper_cond
    else:
        c, latent = conditioner_apply(tier_params["conditioner"], cfg, cond)
        x = x + c
        spk_embed = tier_params["spk_embedding"][spk]          # (B, spk_dim)
        spk_vec = dense_apply(tier_params["spk_expand"], spk_embed)
        x = x + spk_vec[:, None, :]                            # broadcast over T
    y, new_hidden = rnn_apply(cfg, tier_params["gru"], x, hidden)
    out = upsample_apply(tier_params["upsample"], y)
    return out, new_hidden, latent


def mlp_conv_weight(mlp_params):
    """Effective (fs0, q, dim) input-conv weight (applies weight norm)."""
    w = mlp_params["conv_in"]
    if "conv_in_g" in mlp_params:
        norm = jnp.sqrt(jnp.sum(w * w, axis=(0, 1), keepdims=True))
        w = mlp_params["conv_in_g"] * w / norm
    return w


def sample_mlp_logits(mlp_params, cfg: ModelConfig, samples, upper_cond):
    """Sample-level MLP over a whole chunk, pre-softmax (ref model.py:266-325).

    samples:    (B, L + fs0 - 1) int quantized samples.
    upper_cond: (B, L, dim).
    Returns f32 logits (B, L, q_levels).
    """
    w = mlp_conv_weight(mlp_params)                 # (fs0, q, dim)
    # Valid conv over embedded samples, window fs0, mapped onto the MXU by
    # XLA. Identical forward either way; "fused" reassociates the backward
    # through the composite table (ops/embed_conv.py — halves bwd FLOPs).
    impl = embed_conv if cfg.mlp_grad_impl == "fused" else embed_conv_direct
    x = impl(mlp_params["embedding"], w, samples)
    x = jax.nn.relu(x + upper_cond)
    x = jax.nn.relu(dense_apply(mlp_params["hidden"], x))
    x = dense_apply(mlp_params["out"], x)
    # logits always in f32 (the softmax/log-softmax is numerically
    # load-bearing under the bf16 mixed-precision training mode)
    return x.astype(jnp.float32)


def sample_mlp_forward(mlp_params, cfg: ModelConfig, samples, upper_cond):
    """Sample-level MLP log-probs (ref model.py:325 log_softmax output)."""
    return jax.nn.log_softmax(
        sample_mlp_logits(mlp_params, cfg, samples, upper_cond), axis=-1)


# --------------------------------------------------------------------------
# Predictor: TBPTT chunk forward
# --------------------------------------------------------------------------

def predictor_apply(params, cfg: ModelConfig, input_sequences, reset, cond,
                    spk, state, output="log_probs"):
    """Forward one TBPTT chunk (ref model.py:352-436 Predictor.forward).

    Args:
      params: pytree from `init_params`.
      cfg: static ModelConfig (hashable; close over it before jit).
      input_sequences: (B, seq_len + lookback - 1) int32 quantized samples.
      reset: scalar bool (traced) — substitute learned h0 for carried state.
      cond: (B, seq_len // lookback, effective_cond_dim) conditioners.
      spk: (B,) int32 speaker ids.
      state: list of (n_rnn, B, dim) — carried TBPTT hidden, gradients are
        implicitly stopped at the chunk boundary because it is an input
        (ref model.py:348 `.detach()`).

    Returns:
      (log_probs (B, seq_len, q_levels), new_state, latent_or_None)
    """
    batch = input_sequences.shape[0]
    lookback = cfg.lookback
    total = input_sequences.shape[1]
    seq_len = total - lookback + 1

    new_state: List = [None] * cfg.n_tiers
    upper_cond = None
    latent = None
    # Top tier first (ref model.py:378 `reversed`).
    for t in range(cfg.n_tiers - 1, -1, -1):
        tier = params["tiers"][t]
        nfs = cfg.ns_frame_samples[t]
        wdtype = tier["input_expand"]["w"].dtype
        # slice [lookback - nfs : -nfs + 1] (ref model.py:379-388)
        sl = jax.lax.slice_in_dim(input_sequences, lookback - nfs,
                                  total - nfs + 1, axis=1)
        prev = (2.0 * dequantize(cfg, sl)).astype(wdtype)      # (B, seq_len)
        prev = prev.reshape(batch, seq_len // nfs, nfs)
        # reset: select learned h0 (broadcast to batch) vs carried state
        h0 = jnp.broadcast_to(tier["h0"][:, None, :],
                              (cfg.n_rnn, batch, cfg.dim))
        hidden = jnp.where(reset, h0, state[t].astype(wdtype))
        is_top = t == cfg.n_tiers - 1
        out, new_hidden, lat = _tier_forward(
            tier, cfg, prev,
            upper_cond,
            cond.astype(wdtype) if is_top else None,
            spk if is_top else None,
            hidden)
        if is_top:
            latent = lat
        new_state[t] = new_hidden
        upper_cond = out

    fs0 = cfg.frame_sizes[0]
    mlp_samples = jax.lax.slice_in_dim(input_sequences, lookback - fs0,
                                       total, axis=1)
    # output="logits" skips the log_softmax so the loss can fuse it
    # (ops/xent.nll_bits_from_logits) — the train/eval-step hot path.
    mlp_fn = (sample_mlp_logits if output == "logits"
              else sample_mlp_forward)
    out = mlp_fn(params["mlp"], cfg, mlp_samples, upper_cond)
    return out, new_state, latent


def sequence_nll_loss_bits(log_probs, targets):
    """Mean NLL over all positions, in bits (ref nn.py:66-70)."""
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)
    return jnp.mean(nll) * (1.0 / math.log(2.0))
