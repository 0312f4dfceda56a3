"""Fused NLL-in-bits straight from logits, with a hand-written VJP.

The reference computes ``log_softmax`` then gathers the target column
(ref nn.py:66-70 via model.py:325). Done literally, the train step
materializes the (B, L, q) log-prob array (545 MB at the canonical chunk)
just to read one column per position, and autodiff turns the gather into a
scatter plus a full log-softmax VJP. This op computes

    loss = mean(logsumexp(logits) - logits[target]) * log2(e)

directly — identical value — and its backward builds

    dlogits = (softmax(logits) - onehot(target)) * g * log2(e) / N

in one elementwise pass with an iota-compare standing in for the one-hot
(no scatter). Used by the train/eval steps; the log-prob-returning API
(`sample_mlp_forward` + `sequence_nll_loss_bits`) stays for parity tests
and generation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_LOG2E = 1.0 / math.log(2.0)


def _lse_and_picked(logits, targets):
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1)) + m[..., 0]
    picked = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return lse, picked


@jax.custom_vjp
def nll_bits_from_logits(logits, targets):
    """Mean NLL in bits over all positions; logits (..., q), targets int."""
    lse, picked = _lse_and_picked(logits, targets)
    return jnp.mean(lse - picked) * _LOG2E


def _fwd(logits, targets):
    lse, picked = _lse_and_picked(logits, targets)
    return jnp.mean(lse - picked) * _LOG2E, (logits, targets, lse)


def _bwd(res, g):
    logits, targets, lse = res
    q = logits.shape[-1]
    n = logits.size // q
    p = jnp.exp(logits - lse[..., None])
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape,
                                       logits.ndim - 1)
              == targets[..., None])
    dlogits = (p - onehot.astype(logits.dtype)) * (g * _LOG2E / n)
    d_targets = np.zeros(targets.shape, dtype=jax.dtypes.float0)
    return dlogits, d_targets


nll_bits_from_logits.defvjp(_fwd, _bwd)
