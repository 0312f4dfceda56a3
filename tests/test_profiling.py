"""utils/profiling.py — the tracing/roofline aux subsystem (SURVEY.md §5.1
has no reference counterpart; these pin OUR contract)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from msnv_tpu.utils.profiling import StepTimer, roofline, trace


def test_step_timer_warmup_and_summary():
    t = StepTimer(warmup=2)
    for _ in range(5):
        with t:
            pass
    s = t.summary()
    assert s["n"] == 3                       # warmup steps discarded
    assert set(s) == {"mean_s", "p50_s", "p95_s", "n"}
    assert s["p95_s"] >= s["p50_s"] >= 0.0
    assert StepTimer().summary() == {}       # no completed steps yet


def test_roofline_numbers():
    r = roofline(flops=394e12, bytes_moved=819e9, wall_s=1.0)
    np.testing.assert_allclose(r["flops_util"], 1.0)
    np.testing.assert_allclose(r["bw_util"], 1.0)
    np.testing.assert_allclose(r["achieved_tflops"], 394.0)
    np.testing.assert_allclose(r["arithmetic_intensity"], 394e12 / 819e9)
    assert roofline(1e9, 0.0, 1.0)["arithmetic_intensity"] == 1e9


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))).block_until_ready()
    # jax.profiler lays out plugins/profile/<run>/*; assert something landed
    found = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    assert found, f"no trace artifacts under {d}"
