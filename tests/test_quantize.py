"""Quantizer parity: golden values + round-trips + cross-check vs the
reference torch implementation (imported read-only from /root/reference)."""

import sys

import numpy as np
import pytest

import msnv_tpu.ops.quantize as q


def ref_utils():
    """Import the reference utils.py (pure torch funcs) for golden parity."""
    sys.path.insert(0, "/root/reference")
    try:
        import utils as ref
        return ref
    finally:
        sys.path.remove("/root/reference")


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    return ref_utils()


def test_q_zero():
    assert q.q_zero(256) == 128
    assert q.q_zero(16) == 8


def test_ulaw_golden_points():
    # mu-law of 0 is 0; of +-1 is +-1.
    assert float(q.ulaw(np.array(0.0))) == 0.0
    np.testing.assert_allclose(float(q.ulaw(np.array(1.0))), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(q.ulaw(np.array(-1.0))), -1.0, rtol=1e-6)


def test_ulaw_iulaw_roundtrip():
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    np.testing.assert_allclose(np.asarray(q.iulaw(q.ulaw(x))), x, atol=1e-5)


def test_uquantize_range_and_zero():
    # Strictly inside (-1, 1): levels stay in 0..255.
    x = np.linspace(-1, 1, 4097)[1:-1].astype(np.float32)
    lv = np.asarray(q.uquantize(x, 256))
    assert lv.min() >= 0 and lv.max() <= 255
    # Reference edge-case parity: input exactly +1.0 overflows to level 256
    # in f32 (ulaw(1.0) == 1.0 and 256-1e-6 rounds to 256.0 in f32) — the
    # reference has the same latent bug (ref utils.py:48-51); our gather
    # clamps so it is harmless downstream.
    assert int(np.asarray(q.uquantize(np.array(1.0, np.float32), 256))) == 256
    # 0.0 maps to q_zero == 128 (256-1e-6 rounds to 256.0 in f32, matching
    # torch's behavior in the reference).
    assert int(np.asarray(q.uquantize(np.array(0.0), 256))) == 128


def test_udequantize_roundtrip_monotone():
    x = np.linspace(-0.99, 0.99, 513).astype(np.float32)
    rec = np.asarray(q.udequantize(q.uquantize(x, 256), 256))
    # mu-law 8-bit error bound (measured 0.0410 for both ours and the
    # reference — identical to 6e-8)
    assert np.max(np.abs(rec - x)) < 0.042
    assert np.all(np.diff(rec) >= 0)


def test_parity_vs_reference_torch(ref):
    import torch
    x = np.linspace(-1, 1, 2049).astype(np.float32)
    tx = torch.from_numpy(x)

    np.testing.assert_allclose(
        np.asarray(q.ulaw(x)), ref.ulaw(tx).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(q.iulaw(x)), ref.iulaw(tx).numpy(), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(q.uquantize(x, 256)), ref.uquantize(tx, 256).numpy())
    lv = ref.uquantize(tx, 256)
    np.testing.assert_allclose(
        np.asarray(q.udequantize(np.asarray(lv), 256)),
        ref.udequantize(lv, 256).numpy(), atol=1e-6)


def test_linear_quantize_parity(ref):
    import torch
    x = (np.random.RandomState(0).randn(1024) * 0.3).astype(np.float32)
    ours = np.asarray(q.linear_quantize(x, 256))
    theirs = ref.linear_quantize(torch.from_numpy(x), 256).numpy()
    np.testing.assert_array_equal(ours, theirs)
    np.testing.assert_allclose(
        np.asarray(q.linear_dequantize(ours, 256)),
        ref.linear_dequantize(torch.from_numpy(theirs), 256).numpy(),
        atol=1e-6)
