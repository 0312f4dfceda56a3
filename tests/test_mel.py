"""Mel-spectrogram conditioning front-end (msnv_tpu/data/mel.py):
filterbank/STFT correctness, frame-rate alignment contract, and the
cond_source="mel" corpus path end-to-end (Ahocoder-free training)."""

import dataclasses
import os

import numpy as np
import pytest

from msnv_tpu.data.corpus import CorpusConfig, build_corpus, _names
from msnv_tpu.data.mel import (hz_to_mel, log_mel_spectrogram,
                               mel_filterbank, mel_to_hz, stft_power)
from msnv_tpu.data.synthetic import make_synthetic_corpus

SR = 16000


def test_mel_scale_round_trip():
    f = np.asarray([0.0, 100.0, 440.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)


def test_filterbank_shape_and_coverage():
    n_fft, n_mels = 512, 43
    fb = mel_filterbank(SR, n_fft, n_mels)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    assert np.all(fb >= 0)
    # every interior frequency bin is covered by at least one filter
    col = fb.sum(axis=0)
    lo = int(np.ceil(mel_to_hz(hz_to_mel(SR / 2) / (n_mels + 1))
                     / (SR / 2) * (n_fft // 2)))
    assert np.all(col[lo + 1:-1] > 0)


def test_stft_tone_peak_bin():
    """A pure tone's power peaks at bin round(f/sr*n_fft) in every frame."""
    n_fft, hop, f = 512, 80, 1000.0
    t = np.arange(SR) / SR
    audio = 0.5 * np.sin(2 * np.pi * f * t)
    p = stft_power(audio, n_fft, hop)
    peak = np.argmax(p[5:-5], axis=-1)            # skip edge-padded frames
    assert np.all(peak == round(f / SR * n_fft))


def test_log_mel_tone_peak_and_frame_count():
    """Frame count == len//hop; a tone peaks at its mel bin."""
    hop, n_mels, f = 80, 43, 2000.0
    n = 123 * hop
    t = np.arange(n) / SR
    audio = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    m = log_mel_spectrogram(audio, sr=SR, n_mels=n_mels, hop=hop)
    assert m.shape == (123, n_mels)
    # expected mel bin: filter centers are uniform in mel between 0..sr/2
    centers = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(SR / 2),
                                    n_mels + 2))[1:-1]
    expected = int(np.argmin(np.abs(centers - f)))
    peak = int(np.bincount(np.argmax(m[5:-5], axis=-1)).argmax())
    assert abs(peak - expected) <= 1
    assert np.all(np.isfinite(m))


@pytest.fixture(scope="module")
def mel_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("melcorpus"))
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=3,
                          frames_per_utt=120, cond_len=16,
                          partitions=("train",))
    cfg = CorpusConfig(
        datasets_path=root,
        wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"),
        overlap_len=16, seq_len=64, batch_size=4, cond_len=16,
        cond_dim=24, norm_ind=False, cond_source="mel",
        cache_dir=os.path.join(root, "npy_datasets"),
    )
    return root, cfg


def test_mel_corpus_builds_without_cond_files(mel_env):
    """cond_source='mel' never touches the Ahocoder dir and produces a
    normalized, packed corpus at the model's frame rate."""
    root, cfg = mel_env
    # Ahocoder-free: point cond_path at a non-existent dir
    cfg = dataclasses.replace(cfg, cond_path=os.path.join(root, "nope"))
    corpus = build_corpus(cfg, "train")
    B = cfg.batch_size
    assert corpus.data.shape[0] == B
    assert corpus.cond.shape == (B, corpus.data.shape[1] // cfg.cond_len,
                                 cfg.cond_dim)
    assert corpus.spk.shape == corpus.cond.shape[:2]
    # normalized to [0, 1] by the shared min/max path
    assert float(corpus.cond.min()) >= 0.0
    assert float(corpus.cond.max()) <= 1.0
    assert corpus.min_cond.shape == (cfg.cond_dim,)


def test_mel_cache_does_not_alias_ahocoder(mel_env):
    """The mel caches live under distinct filenames, so one cache_dir can
    hold both front-ends without cross-contamination."""
    root, cfg = mel_env
    mel_names = _names(cfg, "train")
    aho_names = _names(dataclasses.replace(cfg, cond_source="ahocoder"),
                       "train")
    for k in ("data", "cond", "spk", "min_max"):
        assert mel_names[k] != aho_names[k]
    build_corpus(cfg, "train")       # idempotent; loads cache if present
    assert os.path.isfile(mel_names["cond"])


def test_mel_corpus_trains(mel_env):
    """One TBPTT train step on the mel-conditioned corpus."""
    import jax
    import jax.numpy as jnp
    from msnv_tpu.config import ModelConfig, TrainConfig
    from msnv_tpu.data.loader import ChunkLoader
    from msnv_tpu.models.samplernn import init_params, init_tier_state
    from msnv_tpu.training.optim import make_optimizer
    from msnv_tpu.training.step import make_train_step

    root, cfg = mel_env
    corpus = build_corpus(cfg, "train")
    loader = ChunkLoader(corpus, seq_len=cfg.seq_len,
                         overlap_len=cfg.overlap_len, cond_len=cfg.cond_len,
                         q_levels=cfg.q_levels, ulaw=cfg.ulaw)
    chunk = loader.get_chunk(0)
    m = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16,
                    cond_dim=cfg.cond_dim, spk_dim=len(corpus.spk_ids),
                    cond_len=cfg.cond_len)
    params = init_params(jax.random.PRNGKey(0), m)
    opt = make_optimizer(TrainConfig())
    step = make_train_step(m, opt)
    state = init_tier_state(m, cfg.batch_size)
    _, _, _, loss = step(params, opt.init(params), state,
                         jnp.asarray(chunk.data), jnp.asarray(chunk.reset),
                         jnp.asarray(chunk.target), jnp.asarray(chunk.cond),
                         jnp.asarray(chunk.spk))
    assert np.isfinite(float(loss))


def test_mel_train_and_generate_cli(tmp_path):
    """Full Ahocoder-free loop through the CLIs: train with
    --cond_source mel, then copy-synthesis generation conditioned on
    log-mel tracks computed from the WAVs themselves."""
    root = str(tmp_path)
    data_dir = os.path.join(root, "datasets")
    os.makedirs(data_dir)
    make_synthetic_corpus(data_dir, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=150, cond_len=16,
                          partitions=("train", "validation", "test"))
    results = os.path.join(root, "results")

    from msnv_tpu.cli.train import main as train_main
    cwd = os.getcwd()
    os.chdir(root)
    try:
        train_main([
            "--exp", "melcli", "--frame_sizes", "4", "4",
            "--n_rnn", "1", "--dim", "32", "--seq_len", "64",
            "--batch_size", "4", "--cond_len", "16", "--cond_dim", "24",
            "--norm_ind", "false", "--datasets_path", data_dir,
            "--dataset", "wav/", "--cond_set", "cond/",
            "--results_path", results, "--epoch_limit", "1",
            "--learning_rate", "2e-3", "--cond_source", "mel",
        ])
    finally:
        os.chdir(cwd)

    exp_dir = os.path.join(results, os.listdir(results)[0])
    ckpts = [c for c in os.listdir(os.path.join(exp_dir, "checkpoints"))
             if c.startswith("best-")]
    model_path = os.path.join(exp_dir, "checkpoints", ckpts[0])

    names = sorted(os.path.splitext(f)[0] for f in
                   os.listdir(os.path.join(data_dir, "wav")))[:2]
    gen_cond = os.path.join(root, "generate_cond.list")
    gen_spk = os.path.join(root, "generate_spk.list")
    with open(gen_cond, "w") as f:
        f.write("\n".join(names))
    with open(gen_spk, "w") as f:
        f.write("\n".join(["0", "1"][:len(names)]))

    out_dir = os.path.join(root, "gen_out")
    from msnv_tpu.cli.generate import main as gen_main
    gen_main([
        "--model", model_path,
        "--cond_path", os.path.join(data_dir, "wav"),   # WAVs, not Ahocoder
        "--cond_source", "mel",
        "--cond_list", gen_cond, "--spk_list", gen_spk,
        "--min_max", os.path.join(data_dir, "npy_datasets",
                                  "min_max_joint_mel.npy"),
        "--out_dir", out_dir,
    ])
    from msnv_tpu.data.wavio import read_wav
    wavs = os.listdir(out_dir)
    assert len(wavs) == len(names)
    for w in wavs:
        audio, sr = read_wav(os.path.join(out_dir, w))
        assert sr == 16000 and audio.shape[0] > 0
        assert np.isfinite(audio).all()
