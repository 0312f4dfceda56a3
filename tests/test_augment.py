"""Waveform augmentation (data/augment.py): resampler fidelity, pitch /
duration semantics, corpus staging. New subsystem (the reference has no
augmentation); exists for the small-corpus regime of docs/REAL_SPEECH.md."""

import os

import numpy as np
import pytest

from msnv_tpu.data.augment import (augment_corpus, gain_perturb,
                                   resample_rational, speed_perturb)
from msnv_tpu.data.wavio import read_wav, write_wav


def _sine(freq, seconds=1.0, sr=16000, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _dominant_freq(x, sr=16000):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec) * sr / len(x)


def test_resample_identity():
    x = _sine(440)
    np.testing.assert_array_equal(resample_rational(x, 1, 1), x)


@pytest.mark.parametrize("p,q", [(9, 10), (11, 10), (2, 1), (1, 2)])
def test_resample_tone_fidelity(p, q):
    """A resampled pure tone keeps its waveform shape at the new rate:
    y[i] ~= x(i*p/q) — compare against the analytically resampled sine."""
    freq = 440.0
    x = _sine(freq)
    y = resample_rational(x, p, q)
    n = len(y)
    assert abs(n - len(x) * q / p) <= q + 1
    t = np.arange(n) * p / q / 16000.0
    expect = 0.5 * np.sin(2 * np.pi * freq * t)
    # ignore filter edges; interior matches to ~60 dB
    sl = slice(200, n - 200)
    err = np.sqrt(np.mean((y[sl] - expect[sl]) ** 2))
    assert err < 1e-3, err


def test_speed_perturb_shifts_pitch_and_duration():
    x = _sine(440, seconds=2.0)
    for f in (0.9, 1.1):
        y = speed_perturb(x, f)
        assert abs(len(y) - len(x) / f) < 20
        assert abs(_dominant_freq(y) - 440 * f) < 5
    assert speed_perturb(x, 1.0) is not None
    with pytest.raises(ValueError):
        speed_perturb(x, 0.0)


def test_gain_perturb_clips_to_pcm16_domain():
    x = _sine(100, seconds=0.05, amp=0.9)
    y = gain_perturb(x, 2.0)
    assert y.max() <= 32767 / 32768
    assert y.min() >= -1.0
    np.testing.assert_allclose(gain_perturb(x, 0.5), 0.5 * x, atol=1e-7)


def test_augment_corpus_staging(tmp_path):
    data_dir = str(tmp_path)
    wav_dir = os.path.join(data_dir, "wav")
    os.makedirs(wav_dir)
    # two speakers, interleaved source list (staging convention)
    names = ["72u000", "73u000", "72u001"]
    for i, n in enumerate(names):
        write_wav(os.path.join(wav_dir, n + ".wav"),
                  _sine(200 + 100 * i, seconds=0.1), 16000)
    with open(os.path.join(data_dir, "wav_train.list"), "w") as f:
        f.write("\n".join(names) + "\n")

    out = augment_corpus(data_dir, speeds=(0.9, 1.1), gains=(0.79,))
    # originals first, then variants rank-by-rank across utterances
    assert out[:3] == names
    assert out[3:6] == ["72u000s090", "73u000s090", "72u001s090"]
    assert len(out) == 3 * 4
    for n in out:
        audio, sr = read_wav(os.path.join(wav_dir, n + ".wav"))
        assert sr == 16000 and len(audio) > 0
        assert n[:2] in ("72", "73")   # corpus speaker prefix survives

    # idempotent: re-running does not re-augment the variants
    out2 = augment_corpus(data_dir, speeds=(0.9, 1.1), gains=(0.79,))
    assert out2 == out


def test_speed_perturb_warns_on_offgrid_snap():
    """Off-grid factors snap to a den<=max_den rational — loudly, so a
    ~2% silent pitch/duration shift can't surprise callers (round-3
    advisor finding)."""
    import warnings

    from msnv_tpu.data.augment import speed_perturb

    x = np.sin(np.linspace(0, 100, 4000)).astype(np.float32)
    with pytest.warns(UserWarning, match="snapped"):
        speed_perturb(x, 0.97)            # 19/20 at max_den=20
    with warnings.catch_warnings():
        warnings.simplefilter("error")    # on-grid factors stay silent
        speed_perturb(x, 0.9)
        speed_perturb(x, 1.1)
        speed_perturb(x, 1.0)


def test_augment_corpus_warns_on_orphan_variant_names(tmp_path):
    """A genuine original whose name matches the variant tag grammar
    ([sg]NNN suffix) is excluded from augmentation — visibly, not
    silently (round-3 advisor finding)."""
    from msnv_tpu.data.augment import augment_corpus
    from msnv_tpu.data.wavio import write_wav

    data_dir = str(tmp_path)
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    x = np.sin(np.linspace(0, 60, 2000)).astype(np.float32)
    # '72s123' parses as a variant of original '72' — which doesn't exist
    for name in ("72u000", "72s123"):
        write_wav(str(wav_dir / (name + ".wav")), x, 16000)
    (tmp_path / "wav_train.list").write_text("72u000\n72s123\n")
    with pytest.warns(UserWarning, match="no corresponding original"):
        out = augment_corpus(data_dir, speeds=(0.9,), gains=())
    assert "72s123" not in out and "72u000" in out
