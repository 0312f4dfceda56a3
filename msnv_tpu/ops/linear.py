"""Dense (1x1-conv-equivalent) layers, initializers, and weight normalization.

The reference uses Conv1d(k=1) everywhere a dense projection is meant
(ref model.py:85-116, 287-301); here those are plain matmuls on the MXU.

Initializer parity targets:
- kaiming_uniform: uniform(+-sqrt(6/fan_in))   (torch 0.4 default gain)
- lecun_uniform:   uniform(+-sqrt(3/fan_in))   (ref nn.py:46-48)
- orthogonal                                    (ref model.py:163)
- concat-style GRU init per 3-gate chunk        (ref nn.py:51-63, model.py:154-165)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def kaiming_uniform(key, shape, fan_in=None, dtype=jnp.float32):
    """uniform(+-sqrt(6/fan_in)); fan_in defaults to prod of trailing dims."""
    if fan_in is None:
        fan_in = int(np.prod(shape[1:]))
    bound = float(np.sqrt(6.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def lecun_uniform(key, shape, fan_in=None, dtype=jnp.float32):
    """uniform(+-sqrt(3/fan_in)) (ref nn.py:46-48)."""
    if fan_in is None:
        fan_in = int(np.prod(shape[1:]))
    bound = float(np.sqrt(3.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def orthogonal(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def normal(key, shape, dtype=jnp.float32):
    """N(0, 1) — torch.nn.Embedding default init."""
    return jax.random.normal(key, shape, dtype)


# --------------------------------------------------------------------------
# Dense layer (Conv1d kernel-size-1 equivalent) with optional weight norm
# --------------------------------------------------------------------------

def dense_init(key, in_dim, out_dim, *, init=kaiming_uniform, bias=True,
               weight_norm=False, dtype=jnp.float32):
    """Params for a dense layer; weight shape (out_dim, in_dim) like torch."""
    w = init(key, (out_dim, in_dim), dtype=dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    if weight_norm:
        # torch weight_norm(dim=0): g holds per-output-row norms; effective
        # weight = g * v / ||v||_row  (ref model.py:119-131).
        p["g"] = jnp.linalg.norm(w, axis=1)
    return p


def dense_weight(p):
    """Materialize the effective weight (applies weight norm if present)."""
    w = p["w"]
    if "g" in p:
        norm = jnp.linalg.norm(w, axis=1, keepdims=True)
        w = p["g"][:, None] * w / norm
    return w


def dense_apply(p, x):
    """x: (..., in_dim) -> (..., out_dim)."""
    w = dense_weight(p)
    y = jnp.einsum("...i,oi->...o", x, w,
                   preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y
