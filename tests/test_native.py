"""Native C++ data-path kernels vs their pure-python twins (bit parity)."""

import os

import numpy as np
import pytest

from msnv_tpu.data import native
from msnv_tpu.data.wavio import read_wav as py_read_wav, write_wav


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")


def test_native_builds():
    # available() is guaranteed by the autouse fixture; the substantive
    # check is that the loader built/loaded the actual shared object
    assert os.path.isfile(native._SO_PATH)


def test_read_wav_parity(tmp_path):
    rng = np.random.RandomState(0)
    x = (rng.rand(3201).astype(np.float32) * 1.8 - 0.9)
    p = str(tmp_path / "t.wav")
    for dtype in ("pcm16", "float32"):
        write_wav(p, x, 16000, dtype=dtype)
        a, sr_a = native.read_wav(p)
        b, sr_b = py_read_wav(p)
        assert sr_a == sr_b == 16000
        np.testing.assert_array_equal(a, b)


def test_loadtxt_parity(tmp_path):
    rng = np.random.RandomState(1)
    # 2-D (cc-like)
    m = rng.randn(57, 40) * 100
    p2 = str(tmp_path / "x.cc")
    np.savetxt(p2, m)
    np.testing.assert_allclose(native.loadtxt(p2), np.loadtxt(p2),
                               rtol=0, atol=0)
    # 1-D (lf0-like), including the -1e10 sentinel
    v = rng.randn(91)
    v[::7] = -1e10
    p1 = str(tmp_path / "x.lf0")
    np.savetxt(p1, v)
    np.testing.assert_allclose(native.loadtxt(p1), np.loadtxt(p1),
                               rtol=0, atol=0)


def test_uquantize_parity():
    from msnv_tpu.ops.quantize import uquantize as jq
    rng = np.random.RandomState(2)
    x = (rng.rand(100000).astype(np.float32) * 2 - 1) * 0.999
    a = native.uquantize(x, 256)
    b = np.asarray(jq(x, 256))
    np.testing.assert_array_equal(a, b)


def test_native_speedup_loadtxt(tmp_path):
    import time
    rng = np.random.RandomState(3)
    m = rng.randn(500, 43)
    p = str(tmp_path / "big.cc")
    np.savetxt(p, m)
    t0 = time.perf_counter()
    for _ in range(5):
        native.loadtxt(p)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        np.loadtxt(p)
    numpy_t = time.perf_counter() - t0
    # informational: should be meaningfully faster, but never assert hard
    # perf on shared CI boxes; just require not-slower-than-2x
    assert native_t < numpy_t * 2, (native_t, numpy_t)
