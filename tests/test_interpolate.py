"""Interpolation parity vs the reference's Python-loop implementation."""

import sys

import numpy as np
import pytest


from msnv_tpu.ops.interpolate import interpolation


def ref_interpolation():
    # deferred: a checkout without the read-only reference repo must not
    # crash collection of this whole file (skip the parity tests instead)
    import os
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    sys.path.insert(0, "/root/reference")
    try:
        from interpolate import interpolation as ref_interp
        return ref_interp
    finally:
        sys.path.remove("/root/reference")


class _LazyRef:
    _fn = None

    def __call__(self, *a, **k):
        if _LazyRef._fn is None:
            _LazyRef._fn = ref_interpolation()
        return _LazyRef._fn(*a, **k)


REF = _LazyRef()
UNVOICED = -1e10


def check(signal, unvoiced_symbol=UNVOICED):
    signal = np.asarray(signal, dtype=np.float64)
    ours_sig, ours_uv = interpolation(signal, unvoiced_symbol)
    ref_sig, ref_uv = REF(signal, unvoiced_symbol)
    np.testing.assert_allclose(ours_sig, ref_sig, atol=1e-12)
    np.testing.assert_array_equal(ours_uv, ref_uv)


def test_all_voiced():
    check([1.0, 2.0, 3.0, 2.5])


def test_all_unvoiced_quirk():
    # Reference returns the signal unchanged with an all-ones mask.
    check([UNVOICED * 2, UNVOICED * 2, UNVOICED * 2])


def test_leading_unvoiced():
    check([UNVOICED * 2, UNVOICED * 2, 5.0, 6.0])


def test_trailing_unvoiced():
    check([5.0, 6.0, UNVOICED * 2, UNVOICED * 2])


def test_interior_run():
    check([1.0, UNVOICED * 2, UNVOICED * 2, 4.0, 5.0])


def test_multiple_runs_random():
    rng = np.random.RandomState(7)
    for _ in range(50):
        n = rng.randint(1, 200)
        sig = rng.randn(n) * 10
        mask = rng.rand(n) < 0.4
        sig[mask] = UNVOICED * 2
        check(sig)


def test_gv_sentinel():
    # gv uses a large positive sentinel with `<=` comparison (ref
    # interpolate.py:102: unvoiced_symbol=1e3) — values <= 1e3 are unvoiced.
    rng = np.random.RandomState(3)
    sig = rng.rand(120) * 2000
    check(sig, unvoiced_symbol=1e3)
