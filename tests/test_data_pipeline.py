"""Data pipeline: WAV round-trip, corpus build/pack/normalize/cache,
look-ahead, and TBPTT chunk-loader window/reset/cond-offset semantics."""

import os

import numpy as np
import pytest

from msnv_tpu.data.wavio import read_wav, write_wav
from msnv_tpu.data.corpus import CorpusConfig, build_corpus, load_corpus
from msnv_tpu.data.loader import ChunkLoader
from msnv_tpu.data.synthetic import make_synthetic_corpus


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    x = (rng.rand(1600).astype(np.float32) * 1.8 - 0.9)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 32768)

    write_wav(p, x, 22050, dtype="float32")
    y, sr = read_wav(p)
    assert sr == 22050
    np.testing.assert_array_equal(y, x)


def test_read_pcm24(tmp_path):
    """Hand-built PCM24 file decodes with full 24-bit precision (corpora
    like studio recordings commonly ship 24-bit; librosa in the reference
    handled them)."""
    import struct
    rng = np.random.RandomState(1)
    levels = (rng.rand(800) * 2 ** 24 - 2 ** 23).astype(np.int64)
    payload = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in levels)
    p = tmp_path / "c.wav"
    with open(p, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", 36 + len(payload), b"WAVE"))
        f.write(struct.pack("<4sI", b"fmt ", 16))
        f.write(struct.pack("<HHIIHH", 1, 1, 16000, 16000 * 3, 3, 24))
        f.write(struct.pack("<4sI", b"data", len(payload)))
        f.write(payload)
    y, sr = read_wav(str(p))
    assert sr == 16000 and y.shape == (800,)
    np.testing.assert_allclose(y, levels / (2.0 ** 23), atol=1e-7)


@pytest.fixture(scope="module")
def corpus_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=3,
                          frames_per_utt=120, cond_len=16,
                          partitions=("train", "validation"))
    cfg = CorpusConfig(
        datasets_path=root,
        wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"),
        overlap_len=16, seq_len=64, batch_size=4, cond_len=16,
        norm_ind=False, cache_dir=os.path.join(root, "npy_datasets"),
    )
    corpus = build_corpus(cfg, "train")
    return cfg, corpus


def test_corpus_packing_shapes(corpus_env):
    cfg, corpus = corpus_env
    B = cfg.batch_size
    assert corpus.data.shape[0] == B
    lane_len = corpus.data.shape[1]
    # lane length is a multiple of (seq+overlap)*cond_len / ... of cond_len
    assert lane_len % cfg.cond_len == 0
    assert corpus.cond.shape == (B, lane_len // cfg.cond_len, 43)
    assert corpus.spk.shape == (B, lane_len // cfg.cond_len)
    # lanes are contiguous slices of the flat stream: lane 1 starts where
    # lane 0 ends (check via audio_id monotonicity across the flat order)
    flat_ids = corpus.audio_id.reshape(-1)
    assert (np.diff(flat_ids) >= 0).all()


def test_corpus_normalization(corpus_env):
    cfg, corpus = corpus_env
    # joint normalization squeezes the train partition into [0, 1]
    assert corpus.cond.min() >= -1e-9
    assert corpus.cond.max() <= 1.0 + 1e-9
    assert np.isfinite(corpus.cond).all()


def test_corpus_cache_roundtrip(corpus_env):
    cfg, corpus = corpus_env
    loaded = load_corpus(cfg, "train")
    np.testing.assert_array_equal(loaded.data, corpus.data)
    np.testing.assert_array_equal(loaded.cond, corpus.cond)
    np.testing.assert_array_equal(loaded.spk, corpus.spk)


def test_validation_uses_train_minmax(corpus_env):
    cfg, _ = corpus_env
    val = build_corpus(cfg, "validation")
    # normalized with TRAIN min/max -> values may leave [0,1] but must be
    # finite and not identical to a self-normalized corpus
    assert np.isfinite(val.cond).all()


def test_look_ahead(corpus_env):
    cfg, corpus = corpus_env
    cfg_la = CorpusConfig(**{**cfg.__dict__, "look_ahead": True})
    la = load_corpus(cfg_la, "train")
    assert la.cond.shape[2] == 86
    # first 43 dims = original; last 43 = shifted left by one frame
    np.testing.assert_array_equal(la.cond[:, :, :43], corpus.cond)
    np.testing.assert_array_equal(la.cond[:, :-1, 43:], corpus.cond[:, 1:])
    # last frame duplicates (ref dataset.py:218-219)
    np.testing.assert_array_equal(la.cond[:, -1, 43:], corpus.cond[:, -1])


def test_chunk_loader_semantics(corpus_env):
    cfg, corpus = corpus_env
    loader = ChunkLoader(corpus, seq_len=cfg.seq_len,
                         overlap_len=cfg.overlap_len, cond_len=cfg.cond_len)
    assert len(loader) > 1
    chunks = list(loader.epoch())
    assert chunks[0].reset and not any(c.reset for c in chunks[1:])

    cis = cfg.seq_len // cfg.cond_len
    for k, c in enumerate(chunks):
        assert c.data.shape == (cfg.batch_size, cfg.seq_len + cfg.overlap_len - 1)
        assert c.target.shape == (cfg.batch_size, cfg.seq_len)
        assert c.cond.shape == (cfg.batch_size, cis, 43)
        assert c.spk.shape == (cfg.batch_size,)
        # target shifted by overlap_len within the lane stream
        np.testing.assert_array_equal(
            c.data[:, cfg.overlap_len:], c.target[:, :-1])

    # lane continuity: chunk k+1's first input samples continue chunk k
    np.testing.assert_array_equal(
        chunks[1].data[:, :cfg.overlap_len - 1],
        loader._qdata[:, cfg.seq_len:cfg.seq_len + cfg.overlap_len - 1])

    # cond one-frame offset (ref dataset.py:261-266)
    np.testing.assert_array_equal(
        np.asarray(chunks[0].cond),
        corpus.cond[:, 1:1 + cis].astype(np.float32))

    # windows never overrun
    last = chunks[-1]
    assert np.isfinite(last.cond).all()
    assert last.data.shape[1] == cfg.seq_len + cfg.overlap_len - 1


def test_chunk_loader_resume(corpus_env):
    cfg, corpus = corpus_env
    loader = ChunkLoader(corpus, cfg.seq_len, cfg.overlap_len, cfg.cond_len)
    full = list(loader.epoch())
    resumed = list(loader.epoch(start_chunk=2))
    assert len(resumed) == len(full) - 2
    np.testing.assert_array_equal(resumed[0].data, full[2].data)


def test_norm_ind_per_speaker(tmp_path):
    root = str(tmp_path)
    make_synthetic_corpus(root, n_speakers=3, utts_per_speaker=2,
                          frames_per_utt=60, cond_len=16)
    cfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"),
        overlap_len=16, seq_len=64, batch_size=2, cond_len=16,
        norm_ind=True, cache_dir=os.path.join(root, "npy"))
    corpus = build_corpus(cfg, "train")
    assert corpus.min_cond.shape == (3, 43)
    assert corpus.max_cond.shape == (3, 43)
    assert corpus.cond.min() >= -1e-9 and corpus.cond.max() <= 1 + 1e-9


def test_static_spk_lists(tmp_path):
    """static_spk=True reads wav_<partition>_static.list and caches with the
    _static suffix (ref dataset.py:39-67)."""
    root = str(tmp_path)
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=3,
                          frames_per_utt=120, cond_len=16,
                          partitions=("train",))
    # static list: only speaker 71's utterances
    names = [n for n in open(os.path.join(root, "wav_train.list"))
             .read().split() if n.startswith("71")]
    with open(os.path.join(root, "wav_train_static.list"), "w") as f:
        f.write("\n".join(names))
    cfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"), overlap_len=16, seq_len=64,
        batch_size=2, cond_len=16, norm_ind=False, static_spk=True,
        cache_dir=os.path.join(root, "npy"))
    corpus = build_corpus(cfg, "train")
    assert (corpus.spk == corpus.spk[0, 0]).all()  # single speaker
    assert os.path.isfile(os.path.join(root, "npy", "train",
                                       "data_static.npy"))
    assert os.path.isfile(os.path.join(root, "npy",
                                       "min_max_joint_static.npy"))


def test_norm_ind_truncated_speaker_raises_clear_error(tmp_path):
    """Packing truncation can drop a whole speaker; norm_ind then fails
    with an actionable message instead of the reference's opaque zero-size
    numpy reduction (mel front-end corpus for file-layout brevity)."""
    import pytest
    from msnv_tpu.data.wavio import write_wav

    root = str(tmp_path)
    wav_dir = os.path.join(root, "wav")
    os.makedirs(wav_dir)
    rng = np.random.RandomState(0)
    # speaker 71: exactly one packed window (batch*lon_seq*cond_len =
    # 1*80*16 = 1280 samples); speaker 72: 400 samples, entirely inside
    # the truncated tail
    write_wav(os.path.join(wav_dir, "71a.wav"),
              (0.3 * rng.randn(1280)).astype(np.float32), 16000)
    write_wav(os.path.join(wav_dir, "72b.wav"),
              (0.3 * rng.randn(400)).astype(np.float32), 16000)
    with open(os.path.join(root, "wav_train.list"), "w") as f:
        f.write("71a\n72b\n")
    cfg = CorpusConfig(
        datasets_path=root, wav_path=wav_dir,
        cond_path=os.path.join(root, "nope"), cond_source="mel",
        cond_dim=8, overlap_len=16, seq_len=64, batch_size=1, cond_len=16,
        norm_ind=True, cache_dir=os.path.join(root, "npy"))
    with pytest.raises(ValueError, match="no frames left after packing"):
        build_corpus(cfg, "train")


def test_synthetic_corpus_interleave():
    """interleave=True round-robins speakers in the partition lists so lane
    packing's tail truncation cannot drop a whole speaker (norm_ind)."""
    import tempfile
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    root = tempfile.mkdtemp()
    make_synthetic_corpus(root, n_speakers=3, utts_per_speaker=2,
                          frames_per_utt=8, cond_len=16, interleave=True)
    names = open(os.path.join(root, "wav_train.list")).read().split()
    assert [n[:2] for n in names] == ["71", "72", "73", "71", "72", "73"]
