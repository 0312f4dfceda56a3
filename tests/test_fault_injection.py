"""Process-level fault injection: SIGKILL a training run mid-epoch, then
verify hard-preemption recovery through the real CLI.

The reference's only failure story is per-epoch restart-resume (ref
train.py:110-126; SURVEY.md §5.3 flags elastic recovery as a gap). Here,
mid-epoch interval checkpoints carry the exact data cursor + optimizer +
TBPTT state, so a killed-and-relaunched run must (a) survive any torn
files the kill left behind, and (b) produce the SAME final parameters as
a never-interrupted run.

Subprocesses are killed by exact PID (Popen.kill), never by pattern.
"""

import glob
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from msnv_tpu.data.synthetic import make_synthetic_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS, so subprocesses must pin CPU at jax-config level (same
# workaround as tests/conftest.py) before touching the CLI.
_RUNNER = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from msnv_tpu.cli.train import main
main({args!r})
"""


def _cli_args(data_dir, results):
    return [
        "--exp", "faultinj",
        "--frame_sizes", "4", "4",
        "--n_rnn", "1", "--dim", "32",
        "--seq_len", "64", "--batch_size", "4",
        "--cond_len", "16", "--norm_ind", "false",
        "--datasets_path", data_dir,
        "--dataset", "wav/", "--cond_set", "cond/",
        "--results_path", results,
        "--epoch_limit", "2",
        "--learning_rate", "2e-3",
        "--save_every_iterations", "5",
    ]


def _launch(data_dir, results, cwd, log_path):
    # stdout to a file, not a PIPE: the poll loop below never drains the
    # child's output, and a filled 64 KB pipe would deadlock it
    code = _RUNNER.format(repo=REPO, args=_cli_args(data_dir, results))
    log = open(log_path, "w")
    proc = subprocess.Popen(
        [sys.executable, "-c", code], cwd=cwd,
        stdout=log, stderr=subprocess.STDOUT, text=True)
    proc._log_file = log
    return proc


def _wait(proc, log_path, timeout=600):
    proc.wait(timeout=timeout)
    proc._log_file.close()
    with open(log_path) as f:
        return f.read()


def _final_params(results):
    import jax
    from msnv_tpu.config import parse_tag
    from msnv_tpu.models.samplernn import init_params
    from msnv_tpu.training.checkpoint import load_any

    tag = os.listdir(results)[0]
    exp_dir = os.path.join(results, tag)
    ckpts = [c for c in os.listdir(os.path.join(exp_dir, "checkpoints"))
             if c.startswith("ep2-it")]
    assert ckpts, os.listdir(os.path.join(exp_dir, "checkpoints"))
    template = init_params(jax.random.PRNGKey(0), parse_tag(tag).model)
    state, _meta = load_any(
        os.path.join(exp_dir, "checkpoints", ckpts[0]),
        {"params": template})
    return state["params"]


@pytest.mark.slow
def test_sigkill_midepoch_recovery(tmp_path):
    data_dir = str(tmp_path / "datasets")
    os.makedirs(data_dir)
    make_synthetic_corpus(data_dir, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=150, cond_len=16,
                          partitions=("train", "validation", "test"))

    # --- run A: uninterrupted ------------------------------------------
    res_a = str(tmp_path / "results_a")
    cwd_a = str(tmp_path / "cwd_a")
    os.makedirs(cwd_a)
    log_a = str(tmp_path / "run_a.log")
    proc = _launch(data_dir, res_a, cwd_a, log_a)
    out = _wait(proc, log_a)
    assert proc.returncode == 0, out

    # --- run B: SIGKILL after the first mid-epoch checkpoint appears ---
    res_b = str(tmp_path / "results_b")
    cwd_b = str(tmp_path / "cwd_b")
    os.makedirs(cwd_b)
    log_b = str(tmp_path / "run_b.log")
    proc = _launch(data_dir, res_b, cwd_b, log_b)
    deadline = time.time() + 600
    killed_live = False
    try:
        while time.time() < deadline:
            if glob.glob(os.path.join(res_b, "*", "checkpoints", "*.npz")):
                break
            if proc.poll() is not None:
                pytest.fail("run B finished before a checkpoint appeared:\n"
                            + open(log_b).read())
            time.sleep(0.05)
        else:
            pytest.fail("no checkpoint appeared within the deadline")
        killed_live = proc.poll() is None
    finally:
        proc.kill()      # SIGKILL, exact PID
        proc.wait(timeout=60)
        proc._log_file.close()
    if not killed_live:
        # the run completed within the poll granularity — nothing was
        # interrupted, so there is no recovery to test on this machine
        pytest.skip("run B finished before the kill landed")

    # --- run B': relaunch; must resume through any torn files ----------
    proc = _launch(data_dir, res_b, cwd_b, log_b)
    out = _wait(proc, log_b)
    assert proc.returncode == 0, out
    assert "resum" in out.lower(), out  # the CLI reports the resume point

    # --- recovery must be exact: same final params as uninterrupted ----
    pa, pb = _final_params(res_a), _final_params(res_b)
    import jax
    la, lb = jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
