"""Quasi-Recurrent tier cell: fo-pooled QRNN (Bradbury et al. 2016).

The reference declares a `qrnn` flag but both branches construct a GRU
(ref model.py:133-153 — torchqrnn import is commented out at ref
model.py:9), so the capability is dead upstream. Here the flag selects a
REAL alternative recurrence, chosen for how it maps onto TPU:

    z = tanh   (W_z x + b_z)        # update candidate
    f = sigmoid(W_f x + b_f)        # forget gate
    o = sigmoid(W_o x + b_o)        # output gate
    c_t = f_t * c_{t-1} + (1 - f_t) * z_t          (fo-pooling)
    h_t = o_t * c_t

All three gates depend only on the input, so the ENTIRE matmul work for a
sequence is one time-parallel (B*T, d_in)x(d_in, 3H) MXU matmul hoisted out
of the scan; the scan body is purely elementwise (VPU), with no
h-dependent matmul at all — unlike the GRU, whose (B,H)x(H,3H) recurrent
matmul serializes MXU work per timestep. This is the k=1 convolutional
width of the QRNN paper (the tiers consume non-overlapping sample frames,
so wider k would peek across frame boundaries).

Signatures mirror ops/gru.py exactly (state: (n_layers, B, H), the carried
state is the cell c), so the tier plumbing, TBPTT state pytree, learned-h0
reset select, and checkpoints are shape-compatible with the GRU path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msnv_tpu.ops.linear import lecun_uniform


def qrnn_init(key, n_layers: int, in_dim: int, hidden: int,
              dtype=jnp.float32):
    """Initialize an `n_layers` fo-pool QRNN; layer 0 consumes `in_dim`."""
    layers = []
    for layer in range(n_layers):
        d_in = in_dim if layer == 0 else hidden
        key, k_z, k_f, k_o = jax.random.split(key, 4)
        w = jnp.concatenate([
            lecun_uniform(k_z, (hidden, d_in), dtype=dtype),
            lecun_uniform(k_f, (hidden, d_in), dtype=dtype),
            lecun_uniform(k_o, (hidden, d_in), dtype=dtype),
        ], axis=0)
        layers.append({
            "w": w,                                 # (3H, d_in), gates [z,f,o]
            "b": jnp.zeros((3 * hidden,), dtype),
        })
    return layers


def _gates(p, x):
    """x: (..., d_in) -> (z, f, o) each (..., H)."""
    g = jnp.einsum("...i,gi->...g", x, p["w"],
                   preferred_element_type=x.dtype) + p["b"]
    z, f, o = jnp.split(g, 3, axis=-1)
    return jnp.tanh(z), jax.nn.sigmoid(f), jax.nn.sigmoid(o)


def _layer_apply(p, x, c0):
    """One QRNN layer. x: (B, T, d_in), c0: (B, H) -> (y (B, T, H), cT)."""
    z, f, o = _gates(p, x)                      # each (B, T, H), one matmul

    def step(c, zf):
        z_t, f_t = zf
        c_new = f_t * c + (1.0 - f_t) * z_t
        return c_new, c_new

    z_t = jnp.swapaxes(z, 0, 1)                 # (T, B, H) scan-major
    f_t = jnp.swapaxes(f, 0, 1)
    cT, cs = jax.lax.scan(step, c0, (z_t, f_t))
    return o * jnp.swapaxes(cs, 0, 1), cT


def qrnn_apply(params, x, c0):
    """Multi-layer fo-pool QRNN; mirrors gru_apply.

    Args:
      params: list of per-layer dicts from `qrnn_init`.
      x: (B, T, d_in).
      c0: (n_layers, B, H) initial cell state.

    Returns:
      (y (B, T, H) — last layer outputs, c (n_layers, B, H)).
    """
    c_out = []
    y = x
    for layer, p in enumerate(params):
        y, cT = _layer_apply(p, y, c0[layer])
        c_out.append(cT)
    return y, jnp.stack(c_out)


def qrnn_cell(params, x, c):
    """Single-step multi-layer QRNN for generation; mirrors gru_cell.

    Args:
      params: list of per-layer dicts.
      x: (B, d_in) one timestep.
      c: (n_layers, B, H).

    Returns:
      (y (B, H), c' (n_layers, B, H)).
    """
    c_out = []
    y = x
    for layer, p in enumerate(params):
        z, f, o = _gates(p, y)
        c_new = f * c[layer] + (1.0 - f) * z
        y = o * c_new
        c_out.append(c_new)
    return y, jnp.stack(c_out)
