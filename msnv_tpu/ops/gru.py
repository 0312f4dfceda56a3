"""Multi-layer GRU as `lax.scan`, with torch gate semantics.

Replaces the reference's cuDNN GRU (ref model.py:133-165). Gate math matches
torch.nn.GRU exactly (gate order [r, z, n]):

    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h

TPU mapping: the input projection for ALL timesteps is one large MXU matmul
outside the scan; the scan body only carries the h-dependent (B, H)x(H, 3H)
matmul. Weight layout is torch's: w_ih (3H, in), w_hh (3H, H).

Init parity (ref model.py:154-165 + nn.py:51-63): w_ih gates all
lecun_uniform over per-gate chunks; w_hh gates [lecun, lecun, orthogonal];
biases zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msnv_tpu.ops.linear import lecun_uniform, orthogonal


def gru_init(key, n_layers: int, in_dim: int, hidden: int, dtype=jnp.float32):
    """Initialize an `n_layers` GRU; layer 0 consumes `in_dim`."""
    layers = []
    for layer in range(n_layers):
        d_in = in_dim if layer == 0 else hidden
        key, k_ih_r, k_ih_z, k_ih_n, k_hh_r, k_hh_z, k_hh_n = (
            jax.random.split(key, 7))
        # Per-gate chunks, matching ref nn.py:51-63 concat_init semantics:
        # each (hidden, d_in) chunk drawn independently with its initializer.
        w_ih = jnp.concatenate([
            lecun_uniform(k_ih_r, (hidden, d_in), dtype=dtype),
            lecun_uniform(k_ih_z, (hidden, d_in), dtype=dtype),
            lecun_uniform(k_ih_n, (hidden, d_in), dtype=dtype),
        ], axis=0)
        w_hh = jnp.concatenate([
            lecun_uniform(k_hh_r, (hidden, hidden), dtype=dtype),
            lecun_uniform(k_hh_z, (hidden, hidden), dtype=dtype),
            orthogonal(k_hh_n, (hidden, hidden), dtype=dtype),
        ], axis=0)
        layers.append({
            "w_ih": w_ih,
            "w_hh": w_hh,
            "b_ih": jnp.zeros((3 * hidden,), dtype),
            "b_hh": jnp.zeros((3 * hidden,), dtype),
        })
    return layers


def _gru_gates(xp, hp, h):
    """Torch-order gate math shared by every impl: xp/hp are the input/
    hidden projections (..., 3H) split [r, z, n]; h is (..., H)."""
    xr, xz, xn = jnp.split(xp, 3, axis=-1)
    hr, hz, hn = jnp.split(hp, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _layer_apply(p, x, h0, impl: str = "xla"):
    """One GRU layer. x: (B, T, d_in), h0: (B, H) -> (y (B, T, H), hT).

    impl="pallas" routes the recurrent sweep through the fused Pallas
    kernel (msnv_tpu/pallas/gru_kernel.py): w_hh VMEM-resident across all
    timesteps instead of re-fetched from HBM per scan step. Falls back to
    the XLA scan for unsupported shapes. Interpret mode (CPU) runs the
    kernel in f32 for exactness; on TPU the matmuls are bf16-in/f32-acc —
    the same precision XLA's default gives f32 matmuls.
    """
    hidden = h0.shape[-1]
    # All-timestep input projection: one MXU matmul (B*T, d_in)x(d_in, 3H).
    x_proj = jnp.einsum("bti,gi->btg", x, p["w_ih"],
                        preferred_element_type=x.dtype) + p["b_ih"]

    if impl == "pallas":
        from msnv_tpu.pallas.gru_kernel import gru_layer, supported
        B = x.shape[0]
        if supported(B, hidden):
            on_tpu = jax.default_backend() == "tpu"
            ys, hT = gru_layer(
                jnp.swapaxes(x_proj, 0, 1).astype(jnp.float32),
                p["w_hh"].T.astype(jnp.float32),
                p["b_hh"].astype(jnp.float32),
                h0.astype(jnp.float32),
                jnp.bfloat16 if on_tpu else jnp.float32,
                not on_tpu,
            )
            return (jnp.swapaxes(ys, 0, 1).astype(x.dtype),
                    hT.astype(x.dtype))

    w_hh_t = p["w_hh"].T  # (H, 3H)
    b_hh = p["b_hh"]

    def step(h, xp):
        # xp: (B, 3H) for this timestep.
        h_proj = jnp.dot(h, w_hh_t, preferred_element_type=h.dtype) + b_hh
        h_new = _gru_gates(xp, h_proj, h)
        return h_new, h_new

    x_proj_t = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 3H) scan-major
    hT, ys = jax.lax.scan(step, h0, x_proj_t)
    return jnp.swapaxes(ys, 0, 1), hT


def _wavefront_apply(params, x, h0):
    """All layers advance along the (time, layer) anti-diagonal in ONE scan:
    wavefront step s computes layer l's timestep t = s - l for every layer at
    once. Sequential depth drops from n_layers*T (layer-by-layer sweeps) to
    T + n_layers - 1, and the per-step recurrent matmuls of all layers fuse
    into a single batched (L, B, H) x (L, H, 3H) MXU call — the standard
    multi-layer-RNN wavefront schedule (what cuDNN does internally for the
    reference's torch.nn.GRU, ref model.py:133-153), expressed as lax.scan.

    Numerics are identical to the layer-by-layer path: same matmuls, same
    order within each (layer, timestep) cell, only the cross-layer schedule
    changes. Inactive cells (s-l outside [0, T)) compute on stale carries and
    are masked out with jnp.where, which also latches each layer's final
    hidden in place.
    """
    L = len(params)
    B, T, _ = x.shape
    H = h0.shape[-1]
    # Layer-0 input projection for ALL timesteps: one large MXU matmul.
    p0 = params[0]
    x0 = jnp.einsum("bti,gi->btg", x, p0["w_ih"],
                    preferred_element_type=x.dtype) + p0["b_ih"]
    # Stacked recurrent weights (L, H, 3H) / biases (L, 1, 3H); upper layers'
    # input weights (L-1, H, 3H) move inside the scan (their inputs are the
    # previous wavefront step's lower-layer outputs).
    w_hh = jnp.stack([p["w_hh"].T for p in params])
    b_hh = jnp.stack([p["b_hh"] for p in params])[:, None, :]
    w_ih_up = jnp.stack([p["w_ih"].T for p in params[1:]])
    b_ih_up = jnp.stack([p["b_ih"] for p in params[1:]])[:, None, :]

    S = T + L - 1
    x0_t = jnp.swapaxes(x0, 0, 1)                         # (T, B, 3H)
    x0_pad = jnp.concatenate(
        [x0_t, jnp.zeros((L - 1, B, 3 * H), x0.dtype)], axis=0)
    lidx = jnp.arange(L)

    def step(carry, xs):
        h, y = carry                                      # (L, B, H) each
        xp0, s = xs                                       # (B, 3H), scalar
        hp = jnp.einsum("lbh,lhg->lbg", h, w_hh,
                        preferred_element_type=h.dtype) + b_hh
        xp_up = jnp.einsum("lbh,lhg->lbg", y[:-1], w_ih_up,
                           preferred_element_type=h.dtype) + b_ih_up
        xp = jnp.concatenate([xp0[None], xp_up], axis=0)  # (L, B, 3H)
        h_new = _gru_gates(xp, hp, h)
        t = s - lidx
        active = ((t >= 0) & (t < T))[:, None, None]
        h = jnp.where(active, h_new, h)   # latches layer l's hT at t == T-1
        y = jnp.where(active, h_new, y)   # layer l+1 reads y[l] next step
        return (h, y), y[-1]

    y0 = jnp.zeros((L, B, H), x0.dtype)
    (hT, _), ys = jax.lax.scan(step, (h0.astype(x0.dtype), y0),
                               (x0_pad, jnp.arange(S)))
    return jnp.swapaxes(ys[L - 1:], 0, 1), hT


def gru_apply(params, x, h0, impl: str = "xla"):
    """Multi-layer GRU.

    Args:
      params: list of per-layer dicts from `gru_init`.
      x: (B, T, d_in).
      h0: (n_layers, B, H) initial hidden.
      impl: "xla" (layer-by-layer lax.scan), "pallas" (fused kernel, see
        _layer_apply), or "wavefront" (all layers in one diagonal scan —
        sequential depth T + n_layers - 1 instead of n_layers * T).

    Returns:
      (y (B, T, H) — last layer outputs, h (n_layers, B, H)).
    """
    if impl == "wavefront" and len(params) > 1:
        return _wavefront_apply(params, x, h0)
    h_out = []
    y = x
    for layer, p in enumerate(params):
        y, hT = _layer_apply(p, y, h0[layer], impl=impl)
        h_out.append(hT)
    return y, jnp.stack(h_out)


def gru_cell(params, x, h):
    """Single-step multi-layer GRU for the generation loop.

    Args:
      params: list of per-layer dicts.
      x: (B, d_in) one timestep.
      h: (n_layers, B, H).

    Returns:
      (y (B, H), h' (n_layers, B, H)).
    """
    h_out = []
    y = x
    for layer, p in enumerate(params):
        xp = jnp.dot(y, p["w_ih"].T, preferred_element_type=y.dtype) + p["b_ih"]
        hp = jnp.dot(h[layer], p["w_hh"].T,
                     preferred_element_type=y.dtype) + p["b_hh"]
        y = _gru_gates(xp, hp, h[layer])
        h_out.append(y)
    return y, jnp.stack(h_out)
