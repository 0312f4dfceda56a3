"""Audio quantizers: mu-law companding and linear, JAX-native.

Numeric parity targets (constants and formulas): ref utils.py:9-63.
All functions operate on jnp arrays and are jit/vmap-safe; they are also
happy with plain numpy inputs (returning jnp arrays).

Reference-parity quirks, deliberately preserved (tests/test_properties.py):
- input exactly +1.0 (and f32 values within ~1 ulp of it) overflows
  uquantize to level q (ref utils.py:48-51); the corpus packer clamps
  upstream and generation never emits it.
- quantize(dequantize(level)) is NOT idempotent: the midrise `q - 1e-6`
  epsilon drops exact bin-edge values one level, so repeated
  decode/re-encode cycles can walk low levels downward one per pass.
  Encode from source audio once; never re-encode decoded output.
"""

from __future__ import annotations

import jax.numpy as jnp

MU = 255.0
LOG_MU1 = 5.5451774444795623  # log(1 + MU), ref utils.py:30-31
_EPS_LINEAR = 1e-2            # ref utils.py:6
_EPS_MIDRISE = 1e-6           # ref utils.py:45


def ulaw(x, max_value: float = 1.0):
    """Mu-law compand x in [-max_value, max_value] to y in [-1, 1].

    ref utils.py:33-36.
    """
    x = jnp.asarray(x)
    v = MU / max_value
    return jnp.sign(x) * jnp.log1p(v * jnp.abs(x)) / LOG_MU1


def iulaw(c, max_value: float = 1.0):
    """Inverse mu-law expand (ref utils.py:39-42)."""
    c = jnp.asarray(c)
    x = jnp.expm1(jnp.abs(c) * LOG_MU1)
    return jnp.sign(c) * x / MU


def midrise(x, q_levels: int = 256):
    """Map x in [-1, 1] to integer levels {0, ..., q_levels-1}.

    ref utils.py:48-51: 0.5*(x+1) * (q_levels - 1e-6), truncated toward zero
    (torch ``.long()``); inputs are non-negative after the affine map so
    truncation == floor.
    """
    x = jnp.asarray(x)
    y = 0.5 * (x + 1.0) * (q_levels - _EPS_MIDRISE)
    return jnp.floor(y).astype(jnp.int32)


def imidrise(xq, q_levels: int = 256):
    """Integer levels back to [-1, 1) (ref utils.py:54-55)."""
    return jnp.asarray(xq).astype(jnp.float32) * 2.0 / q_levels - 1.0


def uquantize(samples, q_levels: int = 256):
    """Default audio quantizer: mu-law then midrise (ref utils.py:58-59)."""
    return midrise(ulaw(samples), q_levels)


def udequantize(samples, q_levels: int = 256):
    """Inverse of uquantize (ref utils.py:62-63)."""
    return iulaw(imidrise(samples, q_levels))


def q_zero(q_levels: int = 256) -> int:
    """The quantization level representing silence (ref utils.py:22-23)."""
    return q_levels // 2


def uquantize_np(samples, q_levels: int = 256):
    """Numpy mu-law quantizer preserving the INPUT precision.

    The reference corpus stores audio as float64 (np.append promotion,
    ref dataset.py:138) and quantizes through torch in f64
    (ref dataset.py:253-254); f32 math lands on different levels at rare
    bin boundaries. The chunk loader uses this f64 path for exact parity.
    """
    import numpy as np
    x = np.asarray(samples)
    y = np.sign(x) * np.log1p(MU * np.abs(x)) / LOG_MU1
    return np.floor(0.5 * (y + 1.0) * (q_levels - _EPS_MIDRISE)).astype(
        np.int32)


def linear_quantize(samples, q_levels: int = 256):
    """Per-sequence min/max linear quantizer (ref utils.py:9-15).

    Normalizes by min/max along the last axis, scales to
    [EPS/2, q_levels - EPS/2] and truncates.
    """
    samples = jnp.asarray(samples, jnp.float32)
    mn = jnp.min(samples, axis=-1, keepdims=True)
    mx = jnp.max(samples - mn, axis=-1, keepdims=True)
    y = (samples - mn) / mx
    y = y * (q_levels - _EPS_LINEAR) + _EPS_LINEAR / 2
    return jnp.floor(y).astype(jnp.int32)


def linear_dequantize(samples, q_levels: int = 256):
    """Levels to [-1, 1) (ref utils.py:18-19)."""
    return jnp.asarray(samples).astype(jnp.float32) / (q_levels / 2) - 1.0
