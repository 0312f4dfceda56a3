"""Pallas TPU kernel: fused GRU layer for the TRAINING path.

The XLA `lax.scan` GRU (ops/gru.py `_layer_apply`) pays per-step costs that
dwarf the actual math at SampleRNN's shapes (T=13/52 steps, B=128, H=1024):
each step re-fetches the (H, 3H) recurrent weight from HBM and crosses a
kernel boundary, measuring ~75 us/step where the MXU work is ~4 us. This
kernel runs the WHOLE layer in one pallas_call:

  - w_hh stays VMEM-resident across all T grid steps (constant index map,
    cast to `mxu_dtype` — bf16 matches XLA's default f32 matmul precision
    on TPU).
  - The hoisted input projections x_proj (one big time-parallel MXU matmul
    outside, exactly like the XLA path) stream through the automatic
    pipeline one (B, 3H) block per grid step, double-buffered by Mosaic.
  - The hidden state h is carried across grid steps in a VMEM scratch
    accumulator (the TPU grid is sequential), gate math in f32 on the VPU.

The backward pass is the same kernel shape swept in reverse (index map
t -> T-1-t) with w_hh^T resident. It consumes the forward's saved per-step
recurrent projections (hproj) instead of re-deriving them, so the only
backward matmul on the critical path is dhproj @ w_hh^T; the weight/bias/
input gradients (dw_hh = sum_t h_prev^T dhproj, db_hh, dx_proj) fall out
as time-parallel reductions OUTSIDE the kernel, where XLA fuses them into
one big MXU matmul. Wired up as jax.custom_vjp in `gru_layer`.

Gate semantics match ops/gru.py (torch order [r, z, n]):
tests/test_gru_kernel.py pins forward and gradients against the lax.scan
reference in CPU interpret mode (mxu_dtype=f32, exact) and the on-chip
`-m tpu` test covers the bf16 TPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 64 * 1024 * 1024


def supported(B: int, H: int) -> bool:
    """Shapes the TPU kernel accepts (lane/sublane tiling alignment)."""
    return H % 128 == 0 and B % 8 == 0


def _gates(xp, hproj, h, H):
    xr, xz, xn = xp[:, :H], xp[:, H:2 * H], xp[:, 2 * H:]
    hr, hz, hn = hproj[:, :H], hproj[:, H:2 * H], hproj[:, 2 * H:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return r, z, n, hn


def _fwd_kernel(mxu_dtype, H, with_residual, xp_ref, w_ref, b_ref, h0_ref,
                ys_ref, *rest):
    """Grid step t: h' = GRU(h, x_proj[t]); emits y_t (and, on the
    training forward, the hproj_t residual for the backward sweep)."""
    hproj_ref, h_scr = (rest if with_residual else (None, rest[0]))
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:, :] = h0_ref[:, :]

    h = h_scr[:, :]
    hproj = jnp.dot(h.astype(mxu_dtype), w_ref[:, :],
                    preferred_element_type=jnp.float32) + b_ref[0, :]
    xp = xp_ref[0]
    r, z, n, _hn = _gates(xp, hproj, h, H)
    h_new = (1.0 - z) * n + z * h
    h_scr[:, :] = h_new
    ys_ref[0] = h_new
    if with_residual:
        hproj_ref[0] = hproj


def _bwd_kernel(mxu_dtype, H, xp_ref, hproj_ref, hprev_ref, dy_ref, wt_ref,
                dxp_ref, dhproj_ref, dh0_ref, dh_scr):
    """Reverse grid step i (t = T-1-i): accumulates dh, emits dxp_t and
    dhproj_t; dh0 lands in a constant-index out block on the last step."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dh_scr[:, :] = jnp.zeros_like(dh_scr)

    xp = xp_ref[0]
    hproj = hproj_ref[0]
    h_prev = hprev_ref[0]
    r, z, n, hn = _gates(xp, hproj, h_prev, H)

    dh_total = dy_ref[0] + dh_scr[:, :]
    dn_pre = dh_total * (1.0 - z) * (1.0 - n * n)
    dz_pre = dh_total * (h_prev - n) * z * (1.0 - z)
    dr_pre = dn_pre * hn * r * (1.0 - r)

    dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
    dhproj = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
    dxp_ref[0] = dxp
    dhproj_ref[0] = dhproj
    dh = dh_total * z + jnp.dot(dhproj.astype(mxu_dtype), wt_ref[:, :],
                                preferred_element_type=jnp.float32)
    dh_scr[:, :] = dh
    dh0_ref[:, :] = dh          # final grid step's write survives


def _fwd_impl(x_proj, w_hh_t, b_hh, h0, mxu_dtype, interpret,
              with_residual=True):
    T, B, H3 = x_proj.shape
    H = H3 // 3
    const = lambda t: (0, 0)
    stream = lambda t: (t, 0, 0)
    out_specs = [pl.BlockSpec((1, B, H), stream, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((T, B, H), jnp.float32)]
    if with_residual:
        out_specs.append(pl.BlockSpec((1, B, 3 * H), stream,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32))
    call = pl.pallas_call(
        functools.partial(_fwd_kernel, mxu_dtype, H, with_residual),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, 3 * H), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    outs = call(x_proj, w_hh_t.astype(mxu_dtype), b_hh[None, :], h0)
    return outs if with_residual else (outs[0], None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gru_layer(x_proj, w_hh_t, b_hh, h0, mxu_dtype=jnp.bfloat16,
              interpret=False):
    """Fused GRU layer (replaces the lax.scan in ops/gru._layer_apply).

    Args:
      x_proj: (T, B, 3H) f32 — hoisted input projections incl. b_ih.
      w_hh_t: (H, 3H) f32 recurrent weight (torch w_hh transposed).
      b_hh: (3H,) f32.
      h0: (B, H) f32 initial hidden.
      mxu_dtype: matmul input cast; jnp.float32 in interpret tests.
      interpret: run in Pallas interpret mode (CPU).

    Returns (ys (T, B, H) f32, hT (B, H) f32).
    """
    ys, _ = _fwd_impl(x_proj, w_hh_t, b_hh, h0, mxu_dtype, interpret,
                      with_residual=False)   # eval path: no hproj HBM write
    return ys, ys[-1]


def _gru_layer_fwd(x_proj, w_hh_t, b_hh, h0, mxu_dtype, interpret):
    ys, hproj = _fwd_impl(x_proj, w_hh_t, b_hh, h0, mxu_dtype, interpret)
    return (ys, ys[-1]), (x_proj, w_hh_t, h0, ys, hproj)


def _gru_layer_bwd(mxu_dtype, interpret, res, cts):
    x_proj, w_hh_t, h0, ys, hproj = res
    dys, dhT = cts
    T, B, H3 = x_proj.shape
    H = H3 // 3
    # fold the final-state cotangent into the last step's output cotangent
    dy = dys.at[-1].add(dhT)
    h_prev = jnp.concatenate([h0[None], ys[:-1]], axis=0)   # (T, B, H)

    const = lambda i: (0, 0)
    rev = lambda i: (T - 1 - i, 0, 0)
    call = pl.pallas_call(
        functools.partial(_bwd_kernel, mxu_dtype, H),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    dxp, dhproj, dh0 = call(x_proj, hproj, h_prev, dy,
                            w_hh_t.T.astype(mxu_dtype))
    # weight/bias grads as one time-parallel MXU contraction outside
    dw = jnp.einsum("tbh,tbg->hg", h_prev, dhproj,
                    preferred_element_type=jnp.float32)
    db = jnp.sum(dhproj, axis=(0, 1))
    return dxp, dw, db, dh0


gru_layer.defvjp(_gru_layer_fwd, _gru_layer_bwd)
