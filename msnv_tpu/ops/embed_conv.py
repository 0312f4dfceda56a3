"""Fused embed+conv with a reassociated custom VJP — the train-step hot op.

The sample-level MLP's input stage (ref model.py:274-285) is
``conv1d(embedding[samples], w)``: a k=fs0 valid conv over q-dim embeddings
of the quantized sample stream. Forward, the embed-then-conv formulation is
MXU-optimal (one big conv). Backward, plain autodiff is wasteful: XLA
computes BOTH ``d emb`` (a transposed conv, ~1.4 TFLOP at the canonical
(128, 1040) chunk) and ``dw`` (another ~1.4 TFLOP correlation), then
scatter-adds ``d emb`` into the 256-row embedding table.

Because the conv input is an embedding lookup, the whole stage is linear in
the one-hot sample stream through the composite table ``T[j] = E @ w[j]``:

    y[b, t] = sum_j T[j][samples[b, t + j]]

so the gradients reassociate exactly:

    dT[j, q, h] = sum_{b,t} onehot(samples)[b, t + j, q] * dy[b, t, h]
    dE = sum_j dT[j] @ w[j].T        (2.7 GFLOP)
    dw[j] = E.T @ dT[j]              (2.7 GFLOP)

``dT`` is ONE ~1.4 TFLOP correlation (the same conv shape XLA would use for
``dw``, with the one-hot stream as lhs) — half the backward FLOPs, no
transposed conv, no scatter. Measured on one v5e chip this takes the
canonical train step from 52 ms to ~42 ms.

Numerics: identical math to autodiff up to float reassociation; gradient
parity is tested against the direct path in tests/test_embed_conv.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _conv(emb, w):
    """(B, S, q) x (k, q, h) -> (B, S-k+1, h) valid conv (NWC/WIO/NWC)."""
    return lax.conv_general_dilated(
        emb, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=emb.dtype)


@jax.custom_vjp
def embed_conv(embedding, w, samples):
    """conv1d(embedding[samples], w) with the reassociated backward.

    embedding: (q, e) table; w: (k, e, h) conv weight; samples: (B, S) int.
    Returns (B, S - k + 1, h).
    """
    return _conv(embedding[samples], w)


def _embed_conv_fwd(embedding, w, samples):
    return embed_conv(embedding, w, samples), (embedding, w, samples)


def _embed_conv_bwd(res, dy):
    embedding, w, samples = res
    q = embedding.shape[0]
    # One-hot sample stream in the compute dtype; (B, S, q).
    oh = jax.nn.one_hot(samples, q, dtype=dy.dtype)
    # dT[q, j, h] = sum_{b,t} oh[b, j + t, q] * dy[b, t, h]:
    # a conv contracting over (batch, t) — lhs roles (C=B, W=S, N=q),
    # rhs roles (I=B, W=T, O=h), out (N=q, W=k, C=h). Output width
    # S - T + 1 = k. This is the same shape XLA uses for its own weight
    # gradients, so it tiles onto the MXU as k big matmuls.
    dT = lax.conv_general_dilated(
        oh, dy, window_strides=(1,), padding="VALID",
        dimension_numbers=("CWN", "IWO", "NWC"),
        preferred_element_type=dy.dtype)          # (q, k, h)
    dT = dT.astype(jnp.float32)
    w32 = w.astype(jnp.float32)
    e32 = embedding.astype(jnp.float32)
    d_embedding = jnp.einsum("qkh,keh->qe", dT, w32).astype(embedding.dtype)
    dw = jnp.einsum("qe,qkh->keh", e32, dT).astype(w.dtype)
    # samples is integer-typed: its cotangent is the zero-size float0.
    d_samples = np.zeros(res[2].shape, dtype=jax.dtypes.float0)
    return d_embedding, dw, d_samples


embed_conv.defvjp(_embed_conv_fwd, _embed_conv_bwd)


def embed_conv_direct(embedding, w, samples):
    """The plain-autodiff formulation (same forward, XLA-derived backward).

    Kept selectable (ModelConfig.mlp_grad_impl="direct") as the
    bit-identical-to-autodiff baseline for parity tests and A/B timing.
    """
    return _conv(embedding[samples], w)
