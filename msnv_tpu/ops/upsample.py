"""Learned upsampling: ConvTranspose1d(k=stride=r) + per-position bias.

Parity target: ref nn.py:7-43 (LearnedUpsampling1d). With kernel == stride
the transposed conv has zero overlap, so on TPU it is a single einsum that
expands each frame vector into `r` output vectors — an MXU matmul followed by
a reshape, no conv machinery needed.

Weight layout here: (in_dim, r, out_dim); torch's ConvTranspose1d weight is
(in_channels, out_channels, r) — converters in tests transpose axes 1/2.
Init: uniform(+-sqrt(6/dim)) on the conv weight (ref model.py:172-174),
zero bias of shape (r, out_dim) (torch keeps (out, r); we store (r, out)).

Documented deviation: the reference ALWAYS weight-norm-wraps this conv
regardless of its flag — ref model.py:177 reads `if weight_norm:` where
`weight_norm` is the imported torch FUNCTION (always truthy), not the
`w_norm` argument. That is a bug (forward-identical at init, only optimizer
trajectories differ); here weight norm is applied only when the config asks
for it. tests/ref_compat.py compensates when copying weights across.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def upsample_init(key, in_dim: int, ratio: int, out_dim: int,
                  weight_norm: bool = False, dtype=jnp.float32):
    bound = float(np.sqrt(6.0 / in_dim))
    w = jax.random.uniform(key, (in_dim, ratio, out_dim), dtype, -bound, bound)
    p = {"w": w, "bias": jnp.zeros((ratio, out_dim), dtype)}
    if weight_norm:
        # torch weight_norm(dim=0) on ConvTranspose1d weight (in, out, r):
        # per-input-channel norms over (out, r). Our layout (in, r, out) has
        # the same dim-0, so g is (in_dim,).
        p["g"] = jnp.sqrt(jnp.sum(w * w, axis=(1, 2)))
    return p


def upsample_apply(p, x):
    """x: (B, T, in_dim) -> (B, T*r, out_dim)."""
    w = p["w"]
    if "g" in p:
        norm = jnp.sqrt(jnp.sum(w * w, axis=(1, 2), keepdims=True))
        w = p["g"][:, None, None] * w / norm
    b, t, _ = x.shape
    r = w.shape[1]
    y = jnp.einsum("btd,dro->btro", x, w, preferred_element_type=x.dtype)
    y = y + p["bias"]  # broadcast over (B, T, r, out)
    return y.reshape(b, t * r, -1)


def upsample_step(p, x):
    """Single-frame upsample for generation. x: (B, in_dim) -> (B, r, out)."""
    w = p["w"]
    if "g" in p:
        norm = jnp.sqrt(jnp.sum(w * w, axis=(1, 2), keepdims=True))
        w = p["g"][:, None, None] * w / norm
    y = jnp.einsum("bd,dro->bro", x, w, preferred_element_type=x.dtype)
    return y + p["bias"]
