"""Pallas TPU kernel: the fused sample-level generation inner loop.

Replaces the XLA scan over the bottom tier's `fs0` upsample slots (one
sample each) with ONE kernel invocation that generates all `fs0` samples
while every weight stays resident in VMEM:

  per sample k in [0, fs0):
    onehot(window) @ fused_table  (MXU, bf16)   # embed+conv collapsed
    -> relu -> @W_hidden -> relu  (MXU)
    -> @W_out -> f32 logits       (MXU)
    -> Gumbel-max draw            (VPU)
    -> shift window

Why it wins: the XLA scan pays ~30-40 us/sample of per-step overhead and
re-reads the 10-20 MB fused table from HBM every sample; here the table,
hidden and output weights are DMA'd once per fs0-sample window and the
whole loop runs on-core. The grid is tiled over the batch; weight blocks
use constant index maps so Mosaic fetches them once per call.

Sampling: Gumbel-max over the f32 logits with noise PRECOMPUTED outside the
kernel (one (fs0, B, q) array per window) — deterministic per PRNG key,
identical on TPU and in CPU interpret mode, and argmax(logits + gumbel) is
exactly a categorical draw. The XLA path's jax.random.categorical is the
same distribution from a different stream.

Carry trick: after fs0 steps the sliding window buffer CONTAINS exactly the
fs0 samples generated this window, so the final buffer is the only output.

Semantics: identical MLP math to models/generate._mlp_logits (bf16 matmuls,
f32 logits) — tests/test_pallas_kernel.py pins kernel samples == XLA-path
samples under sharpened (argmax-dominant) outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_kernel(fs0, q, dim, tile_b, table_ref, wh_ref, bh_ref,
                   wo_ref, bo_ref, slots_ref, buf_ref, noise_ref, out_ref):
    """One grid program: fs0 samples for a tile of `tile_b` lanes."""

    def body(k, buf):
        logits = _sample_logits(fs0, q, tile_b, table_ref, wh_ref, bh_ref,
                                wo_ref, bo_ref, buf, slots_ref[k, :, :])
        # Gumbel-max categorical draw with precomputed noise
        s = jnp.argmax(logits + noise_ref[k, :, :], axis=-1)
        s = s.astype(jnp.int32)
        # slide the window
        return jnp.concatenate([buf[:, 1:], s[:, None]], axis=1)

    final = jax.lax.fori_loop(0, fs0, body, buf_ref[:, :])
    # final window == the fs0 samples generated in order
    out_ref[:, :] = final


def make_sample_window(fs0: int, q: int, dim: int, batch: int,
                       tile_b: int = 64, interpret: bool = False):
    """Build sample_window(table, w_h, b_h, w_o, b_o, slots, buf, noise).

    table: (fs0*q, dim) — fused embed+conv, position-major
           (reshape of models/generate.fused_embed_conv's (fs0, q, dim)).
    w_h: (dim, dim), b_h: (1, dim) f32, w_o: (dim, q), b_o: (1, q) f32.
    slots: (fs0, batch, dim) bottom-tier upsampled conditioning.
    buf: (batch, fs0) int32 — the last fs0 samples.
    noise: (fs0, batch, q) f32 Gumbel noise.
    Returns samples (batch, fs0) int32.
    """
    tile_b = min(tile_b, batch)
    assert batch % tile_b == 0, (batch, tile_b)
    grid = (batch // tile_b,)

    kernel = functools.partial(_window_kernel, fs0, q, dim, tile_b)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((fs0 * q, dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, q), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((fs0, tile_b, dim), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, fs0), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fs0, tile_b, q), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, fs0), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, fs0), jnp.int32),
        interpret=interpret,
    )


def gumbel_noise(key, shape):
    """Gumbel(0,1) noise; argmax(logits + noise) == categorical(logits)."""
    u = jax.random.uniform(key, shape, jnp.float32,
                           minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


# ---------------------------------------------------------------------------
# v2/v3: multi-tile grid with weights resident ACROSS tiles + in-kernel PRNG
# ---------------------------------------------------------------------------
#
# The v1 kernel above is a single-program call with precomputed Gumbel
# noise — kept ONLY as the CPU-interpret reference (the in-kernel TPU PRNG
# has no interpret support); its former batch-slicing wrapper re-DMA'd the
# ~13 MB of weights once per 64-lane slice and was removed from the TPU
# dispatch (models/generate._pallas_window_sampler). v2 runs ONE
# pallas_call with grid=(n_tiles,): weight blocks have constant index maps
# so Mosaic fetches them once for the whole grid; the per-tile slots are
# hand-DMA'd from HBM into a single-buffered scratch (the automatic
# pipeline would double-buffer them and blow the 16 MB VMEM budget), and
# Gumbel noise is drawn in-kernel from the TPU PRNG (no noise traffic).
#
# The per-sample math is shared (`_sample_logits`), as is the in-kernel
# draw (`_gumbel_draw`); v1's CPU interpret tests pin the math, and the
# on-chip tier validates v2/v3 end-to-end.


def _sample_logits(fs0, q, tile_b, table_ref, wh_ref, bh_ref, wo_ref,
                   bo_ref, buf, slot_row):
    """Shared per-sample MLP math: window one-hot -> f32 logits."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (tile_b, fs0, q), 2)
    onehot = (idx == buf[:, :, None]).astype(table_ref.dtype)
    onehot = onehot.reshape(tile_b, fs0 * q)
    x = jnp.dot(onehot, table_ref[:, :], preferred_element_type=jnp.float32)
    x = x + slot_row.astype(jnp.float32)
    x = jnp.maximum(x, 0.0).astype(table_ref.dtype)
    h = jnp.dot(x, wh_ref[:, :], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + bh_ref[0, :], 0.0).astype(table_ref.dtype)
    logits = jnp.dot(h, wo_ref[:, :], preferred_element_type=jnp.float32)
    return logits + bo_ref[0, :]


def _gumbel_draw(tile_b, q, logits):
    """In-kernel Gumbel-max categorical draw over f32 logits -> (tile_b,)
    int32 samples, from the TPU PRNG (seeded per grid program)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits((tile_b, q)), jnp.uint32)
    # Mosaic has no uint32->f32 cast; (bits >> 8) < 2^24 so the
    # int32 reinterpretation is value-preserving
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = (bits24.astype(jnp.float32) + 0.5) * (1.0 / 16777216.0)
    gumbel = -jnp.log(-jnp.log(u))
    return jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)


def _window_kernel_v2(fs0, q, dim, tile_b, seed_ref, table_ref, wh_ref,
                      bh_ref, wo_ref, bo_ref, slots_hbm, buf_ref, out_ref):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * 7919)

    def run(slots_vmem, sem):
        copy = pltpu.make_async_copy(slots_hbm.at[i], slots_vmem, sem)
        copy.start()
        copy.wait()

        def body(k, buf):
            logits = _sample_logits(fs0, q, tile_b, table_ref, wh_ref,
                                    bh_ref, wo_ref, bo_ref, buf,
                                    slots_vmem[k, :, :])
            s = _gumbel_draw(tile_b, q, logits)
            return jnp.concatenate([buf[:, 1:], s[:, None]], axis=1)

        out_ref[:, :] = jax.lax.fori_loop(0, fs0, body, buf_ref[:, :])

    pl.run_scoped(
        run,
        pltpu.VMEM((fs0, tile_b, dim), table_ref.dtype),
        pltpu.SemaphoreType.DMA(()),
    )


def _window_kernel_v3(fs0, q, dim, tile_b, seed_ref, table_ref, wh_ref,
                      bh_ref, wo_ref, bo_ref, slots_hbm, buf_ref, out_ref):
    """v3: tile_b=128 (full MXU rows) fits VMEM by streaming slot ROWS from
    HBM with a 2-deep double buffer instead of landing the whole window."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * 7919)

    def run(slot_buf, sems):
        def dma(k):
            return pltpu.make_async_copy(
                slots_hbm.at[i, k], slot_buf.at[k % 2], sems.at[k % 2])

        dma(0).start()

        def body(k, buf):
            @pl.when(k + 1 < fs0)
            def _():
                dma(k + 1).start()
            dma(k).wait()
            logits = _sample_logits(fs0, q, tile_b, table_ref, wh_ref,
                                    bh_ref, wo_ref, bo_ref, buf,
                                    slot_buf[k % 2])
            s = _gumbel_draw(tile_b, q, logits)
            return jnp.concatenate([buf[:, 1:], s[:, None]], axis=1)

        out_ref[:, :] = jax.lax.fori_loop(0, fs0, body, buf_ref[:, :])

    pl.run_scoped(
        run,
        pltpu.VMEM((2, tile_b, dim), table_ref.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    )


def make_sample_window_v3(fs0: int, q: int, dim: int, batch: int,
                          tile_b: int = 128):
    """Like v2 but with per-sample slot-row streaming; tile_b up to 128."""
    tile_b = min(tile_b, batch)
    assert batch % tile_b == 0, (batch, tile_b)
    n_tiles = batch // tile_b

    kernel = functools.partial(_window_kernel_v3, fs0, q, dim, tile_b)
    const = lambda i, s: (0, 0)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((fs0 * q, dim), const,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dim, dim), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dim), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((dim, q), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q), const, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),   # slots in HBM
                pl.BlockSpec((tile_b, fs0), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, fs0), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, fs0), jnp.int32),
    )


def make_sample_window_v2(fs0: int, q: int, dim: int, batch: int,
                          tile_b: int = 32):
    """sample_window_v2(seed, table, w_h, b_h, w_o, b_o, slots, buf).

    seed: (1,) int32; slots: (n_tiles, fs0, tile_b, dim) — batch pre-tiled;
    buf: (batch, fs0). Returns samples (batch, fs0) int32. TPU only (the
    in-kernel PRNG has no CPU interpret support).
    """
    tile_b = min(tile_b, batch)
    assert batch % tile_b == 0, (batch, tile_b)
    n_tiles = batch // tile_b

    kernel = functools.partial(_window_kernel_v2, fs0, q, dim, tile_b)
    const = lambda i, s: (0, 0)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((fs0 * q, dim), const,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dim, dim), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dim), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((dim, q), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q), const, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),   # slots stay in HBM
                pl.BlockSpec((tile_b, fs0), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, fs0), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, fs0), jnp.int32),
    )
