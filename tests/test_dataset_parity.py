"""Data-path parity vs the ACTUAL reference FolderDataset.

The reference's dataset.py imports librosa (not in this image), so a tiny
shim module backed by our WAV reader is injected; everything else runs the
reference code unmodified on a synthetic Ahocoder-style corpus with
cond_len=80 (the reference hardcodes its 60-sample sync threshold and
80-sample frames).

Compared: packed lane arrays (audio, conditioners, speakers), min/max
normalization, and per-chunk __getitem__ outputs (data/target/reset/cond/
spk) against our ChunkLoader.

Known deviations excluded by fixture design: no utterance with
oversize == 60 (reference double-branch bug).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from msnv_tpu.data.corpus import CorpusConfig, build_corpus
from msnv_tpu.data.loader import ChunkLoader
from msnv_tpu.data.synthetic import make_synthetic_corpus
from msnv_tpu.data.wavio import read_wav


def _install_librosa_shim():
    if "librosa" in sys.modules:
        return
    librosa = types.ModuleType("librosa")
    core = types.ModuleType("librosa.core")

    def load(path, sr=None, mono=True):
        return read_wav(path)

    core.load = load
    librosa.core = core
    sys.modules["librosa"] = librosa
    sys.modules["librosa.core"] = core


def _import_reference_dataset():
    _install_librosa_shim()
    for p in ("/root/reference",):
        if p not in sys.path:
            sys.path.insert(0, p)
    sys.modules.pop("dataset", None)
    import dataset as ref_dataset
    return ref_dataset


SEQ_LEN = 160
BATCH = 2
OVERLAP = 16  # reference overlap == our model lookback; use (4,4)->16


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dsparity"))
    # cond_len=80: the reference hardcodes 80-sample frames + threshold 60
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=3,
                          frames_per_utt=60, cond_len=80,
                          partitions=("train",))
    ref_dataset = _import_reference_dataset()

    # reference dataset writes its npy cache to relative 'npy_datasets/'
    ref_cwd = os.path.join(root, "refrun")
    os.makedirs(os.path.join(ref_cwd, "npy_datasets", "train"),
                exist_ok=True)
    cwd = os.getcwd()
    os.chdir(ref_cwd)
    try:
        ref_ds = ref_dataset.FolderDataset(
            datasets_path=root + "/", path=os.path.join(root, "wav") + "/",
            cond_path=os.path.join(root, "cond") + "/",
            overlap_len=OVERLAP, q_levels=256, ulaw=True, seq_len=SEQ_LEN,
            batch_size=BATCH, cond_dim=43, cond_len=80, norm_ind=False,
            static_spk=False, look_ahead=False, partition="train")
    finally:
        os.chdir(cwd)

    ours_cfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"), overlap_len=OVERLAP,
        q_levels=256, ulaw=True, seq_len=SEQ_LEN, batch_size=BATCH,
        cond_dim=43, cond_len=80, norm_ind=False, static_spk=False,
        look_ahead=False, cache_dir=os.path.join(root, "ours_npy"))
    ours = build_corpus(ours_cfg, "train")
    return ref_ds, ours, ours_cfg


def test_packed_arrays_match(corpora):
    ref_ds, ours, _ = corpora
    np.testing.assert_allclose(np.asarray(ref_ds.data), ours.data,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ref_ds.cond), ours.cond,
                               atol=1e-10)
    np.testing.assert_array_equal(np.asarray(ref_ds.global_spk), ours.spk)
    np.testing.assert_allclose(ref_ds.min_cond, ours.min_cond, atol=1e-12)
    np.testing.assert_allclose(ref_ds.max_cond, ours.max_cond, atol=1e-12)


def test_chunks_match_reference_getitem(corpora):
    ref_ds, ours, _ = corpora
    loader = ChunkLoader(ours, seq_len=SEQ_LEN, overlap_len=OVERLAP,
                         cond_len=80)
    assert len(loader) >= 2
    for k in range(len(loader)):
        chunk = loader.get_chunk(k)
        for lane in range(BATCH):
            data, reset, target, cond, spk = ref_ds[k * BATCH + lane]
            np.testing.assert_array_equal(chunk.data[lane],
                                          data.numpy())
            np.testing.assert_array_equal(chunk.target[lane],
                                          target.numpy())
            assert bool(chunk.reset) == bool(reset)
            np.testing.assert_allclose(chunk.cond[lane],
                                       cond.numpy().astype(np.float32),
                                       atol=1e-6)
            assert int(chunk.spk[lane]) == int(spk[0])


def test_load_reference_built_cache(corpora, tmp_path):
    """Drop-in cache compatibility: our load_corpus reads a npy_datasets/
    directory written by the REFERENCE FolderDataset."""
    ref_ds, ours, ours_cfg = corpora
    # the reference wrote its cache under <root>/refrun/npy_datasets
    import dataclasses
    ref_cache = os.path.join(
        os.path.dirname(ours_cfg.cache_dir), "refrun", "npy_datasets")
    assert os.path.isfile(os.path.join(ref_cache, "train", "data.npy"))
    cfg2 = dataclasses.replace(ours_cfg, cache_dir=ref_cache)
    from msnv_tpu.data.corpus import load_corpus
    loaded = load_corpus(cfg2, "train")
    np.testing.assert_allclose(loaded.data, ours.data, atol=1e-7)
    np.testing.assert_allclose(loaded.cond, ours.cond, atol=1e-10)
    np.testing.assert_array_equal(loaded.spk, ours.spk)
