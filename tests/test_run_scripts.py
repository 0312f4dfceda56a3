"""Shell entry points (ref run.sh:1-12 dispatcher + per-experiment scripts):
the dispatch chain down to the train CLI parses, without training."""

import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN = os.path.join(ROOT, "scripts", "run.sh")


def _run(*args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(["bash", RUN, *args], cwd=ROOT, env=env,
                          capture_output=True, text=True, timeout=300)


@pytest.mark.parametrize("exp", ["samplernn", "samplernn-gan",
                                 "bottle-neck"])
def test_dispatcher_reaches_train_cli(exp):
    # --help exercises run.sh -> run_<exp>.sh -> python -m msnv_tpu.cli.train
    # argument wiring end-to-end (argparse exits 0 before any training)
    r = _run(exp, "--help")
    assert r.returncode == 0, r.stderr
    assert "--frame_sizes" in r.stdout


def test_dispatcher_rejects_unknown_experiment():
    r = _run("fftnet")
    assert r.returncode == 1
    assert "usage:" in r.stdout
