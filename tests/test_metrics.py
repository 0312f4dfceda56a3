"""Objective evaluation metrics (msnv_tpu/eval/metrics.py) + metrics CLI.

The reference has no objective evaluation code (MOS panels only, ref
doc/paper.pdf Table 1), so these tests validate against signal-processing
ground truth: known-F0 sinusoids, scipy DCT, constructed voicing masks.
"""

import json
import os

import numpy as np
import pytest

from msnv_tpu.eval.metrics import (
    _dct_ii_ortho,
    evaluate_pair,
    f0_metrics,
    frame_f0,
    lf0_track_to_f0,
    mcd,
    mel_cepstrum,
)

SR = 16000


def tone(f0, seconds=0.5, sr=SR, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * f0 * t)).astype(np.float64)


# ---------------------------------------------------------------- DCT/MCD

def test_dct_matches_scipy():
    scipy_fft = pytest.importorskip("scipy.fft")
    x = np.random.RandomState(0).randn(7, 40)
    ours = x @ _dct_ii_ortho(40, 40).T
    theirs = scipy_fft.dct(x, type=2, norm="ortho", axis=-1)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_mel_cepstrum_shape_and_c0_energy():
    # broadband signal: every mel band carries energy above the log floor,
    # so a gain change shifts ln-mel by a constant -> moves ONLY c0
    x = 0.3 * np.random.RandomState(0).randn(int(0.2 * SR))
    c = mel_cepstrum(x, n_mfcc=25)
    assert c.shape == ((len(x) // 80), 25)
    c_scaled = mel_cepstrum(0.25 * x, n_mfcc=25)
    assert np.max(np.abs(c[:, 1:] - c_scaled[:, 1:])) < 1e-6
    assert np.min(c[:, 0] - c_scaled[:, 0]) > 0.1


def test_mcd_identity_is_zero():
    x = tone(200, 0.3)
    out = mcd(x, x)
    assert out["mcd_db"] == 0.0
    assert out["n_frames"] == len(x) // 80


def test_mcd_gain_invariant_but_noise_sensitive():
    rng = np.random.RandomState(1)
    # broadband base signal (gain invariance needs all bands off the floor)
    x = tone(180, 0.3) + 0.05 * rng.randn(int(0.3 * SR))
    assert mcd(x, 0.5 * x)["mcd_db"] < 1e-6          # c0 excluded
    small = mcd(x, x + 0.01 * rng.randn(len(x)))["mcd_db"]
    large = mcd(x, x + 0.10 * rng.randn(len(x)))["mcd_db"]
    assert 0.0 < small < large


def test_mcd_truncates_to_common_length():
    x = tone(150, 0.3)
    out = mcd(x, x[: len(x) // 2])
    assert out["n_frames"] == (len(x) // 2) // 80


# ---------------------------------------------------------------- pitch

@pytest.mark.parametrize("f0_true", [110.0, 220.0, 330.0])
def test_frame_f0_sinusoid(f0_true):
    f0, voiced = frame_f0(tone(f0_true, 0.4))
    assert voiced.mean() > 0.9
    med = np.median(f0[voiced])
    assert abs(med - f0_true) < 2.0, med


def test_frame_f0_silence_unvoiced():
    f0, voiced = frame_f0(np.zeros(SR // 4))
    assert not voiced.any()
    assert (f0 == 0.0).all()


def test_frame_f0_noise_mostly_unvoiced():
    x = 0.3 * np.random.RandomState(2).randn(SR // 2)
    _, voiced = frame_f0(x)
    assert voiced.mean() < 0.3


def test_frame_f0_alternating_tone_silence():
    seg = SR // 8  # 2000 samples = 25 frames per segment
    x = np.concatenate([tone(160, seg / SR), np.zeros(seg),
                        tone(160, seg / SR)])
    f0, voiced = frame_f0(x)
    n = seg // 80
    # interiors (clear of the window straddling the boundaries)
    assert voiced[5:n - 5].mean() > 0.9
    assert voiced[n + 5:2 * n - 5].mean() < 0.1
    assert voiced[2 * n + 5:3 * n - 5].mean() > 0.9


# ---------------------------------------------------------------- F0 metrics

def test_lf0_track_to_f0():
    lf0 = np.array([np.log(120.0), -1e10, np.log(240.0)])
    f0, voiced = lf0_track_to_f0(lf0)
    np.testing.assert_allclose(f0, [120.0, 0.0, 240.0], rtol=1e-12)
    assert voiced.tolist() == [True, False, True]


def test_f0_metrics_identity_and_mismatch():
    f0 = np.array([100.0, 110.0, 0.0, 120.0])
    v = np.array([True, True, False, True])
    out = f0_metrics(f0, v, f0, v)
    assert out["f0_rmse_hz"] == 0.0
    assert out["vuv_error_rate"] == 0.0
    assert out["n_both_voiced"] == 3

    f0_b = f0 + np.array([3.0, -4.0, 0.0, 0.0])
    v_b = np.array([True, True, True, False])  # 2 voicing flips
    out = f0_metrics(f0, v, f0_b, v_b)
    # both-voiced frames: 0 and 1 -> errors 3, -4
    assert out["f0_rmse_hz"] == pytest.approx(np.sqrt((9 + 16) / 2))
    assert out["vuv_error_rate"] == pytest.approx(0.5)


def test_f0_metrics_no_overlap_gives_nan():
    v_a = np.array([True, False])
    v_b = np.array([False, True])
    out = f0_metrics(np.ones(2), v_a, np.ones(2), v_b)
    assert np.isnan(out["f0_rmse_hz"])
    assert out["vuv_error_rate"] == 1.0


def test_evaluate_pair_keys():
    x = tone(140, 0.25)
    out = evaluate_pair(x, x)
    assert out["mcd_db"] == 0.0
    assert out["f0_rmse_hz"] == 0.0
    assert out["vuv_error_rate"] == 0.0


# ---------------------------------------------------------------- CLI

def test_metrics_cli_end_to_end(tmp_path, capsys):
    from msnv_tpu.cli.metrics import main, utt_id
    from msnv_tpu.data.wavio import write_wav

    assert utt_id("best-ep3-it9_file-72abc_spk-72.wav") == "72abc"
    assert utt_id("72abc.wav") == "72abc"

    ref_dir = tmp_path / "wav" / "72"
    gen_dir = tmp_path / "samples"
    lf0_dir = tmp_path / "cond" / "72"
    for d in (ref_dir, gen_dir, lf0_dir):
        d.mkdir(parents=True)

    x = tone(130, 0.3).astype(np.float32)
    write_wav(str(ref_dir / "72utt1.wav"), x, SR)
    write_wav(str(gen_dir / "ckpt_file-72utt1_spk-72.wav"),
              x + np.float32(0.02) * np.random.RandomState(0)
              .randn(len(x)).astype(np.float32), SR)
    lf0 = np.full(len(x) // 80, np.log(130.0))
    np.savetxt(str(lf0_dir / "72utt1.lf0"), lf0)

    rc = main(["--gen", str(gen_dir), "--ref", str(tmp_path / "wav"),
               "--lf0", str(tmp_path / "cond")])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    pair, agg = lines
    assert pair["utt"] == "72utt1"
    assert pair["mcd_db"] > 0.0
    assert pair["f0_rmse_hz"] < 3.0
    assert pair["ahocoder_f0_rmse_hz"] < 3.0
    assert agg["aggregate"] and agg["n_pairs"] == 1


def test_metrics_cli_no_pairs(tmp_path, capsys):
    from msnv_tpu.cli.metrics import main
    from msnv_tpu.data.wavio import write_wav

    gen_dir = tmp_path / "gen"
    gen_dir.mkdir()
    write_wav(str(gen_dir / "ckpt_file-zz1_spk-0.wav"),
              np.zeros(800, np.float32), SR)
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    assert main(["--gen", str(gen_dir), "--ref", str(ref_dir)]) == 1


def test_saturation_burst_detector():
    """Energy-run-length detector for the thesis-§4.3 failure mode:
    clean speech-like audio scores zero; a sustained full-scale noise
    burst (~9,500 samples, the thesis's reported length) is found with
    the right duration; transient peaks do NOT count."""
    from msnv_tpu.eval.metrics import saturation_bursts

    sr = 16000
    rng = np.random.RandomState(0)
    t = np.arange(4 * sr) / sr
    clean = (0.3 * np.sin(2 * np.pi * 150 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    out = saturation_bursts(clean, sr=sr)
    assert out == {"burst_fraction": 0.0, "n_bursts": 0,
                   "longest_burst_s": 0.0, "clip_fraction": 0.0}

    # inject one 9,500-sample full-scale noise burst
    burst = clean.copy()
    n_burst = 9500
    burst[sr:sr + n_burst] = np.clip(
        rng.randn(n_burst).astype(np.float32), -1, 1)
    out = saturation_bursts(burst, sr=sr)
    assert out["n_bursts"] == 1
    assert out["longest_burst_s"] == pytest.approx(n_burst / sr, abs=0.02)
    assert out["burst_fraction"] == pytest.approx(n_burst / len(burst),
                                                  abs=0.01)
    # ~32% of the clipped-gaussian burst sits at |x|>=0.99, diluted over
    # the whole 4 s signal: 9500*0.32/64000 ~ 0.047
    assert out["clip_fraction"] == pytest.approx(0.047, abs=0.02)

    # a transient loud click (< min_run_s) is not a burst
    click = clean.copy()
    click[sr:sr + 300] = 1.0
    out = saturation_bursts(click, sr=sr)
    assert out["n_bursts"] == 0 and out["burst_fraction"] == 0.0

    # two separated bursts count separately
    two = clean.copy()
    two[sr:sr + 2000] = 0.9
    two[2 * sr:2 * sr + 3000] = -0.9
    out = saturation_bursts(two, sr=sr)
    assert out["n_bursts"] == 2
    assert out["longest_burst_s"] == pytest.approx(3000 / sr, abs=0.02)


def test_evaluate_pair_includes_burst_metrics():
    from msnv_tpu.eval.metrics import evaluate_pair
    sr = 16000
    t = np.arange(sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    out = evaluate_pair(ref, ref, sr=sr)
    assert out["burst_fraction"] == 0.0
    assert out["n_bursts"] == 0
    assert out["clip_fraction"] == 0.0
