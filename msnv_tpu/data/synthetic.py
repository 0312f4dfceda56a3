"""Synthetic fixture corpora for tests and benchmarks.

The TC-STAR corpus is private (the reference repo ships only dangling
symlinks under tcstar/), so tests build a miniature corpus with the same
on-disk structure: WAV files plus Ahocoder-style .cc/.lf0/.gv text files and
wav_<partition>.list partition lists (ref tcstar/*.list, dataset.py:66-107).
"""

from __future__ import annotations

import os

import numpy as np

from msnv_tpu.data.wavio import write_wav
from msnv_tpu.data.corpus import F0_UNVOICED, GV_UNVOICED


def make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=3,
                          frames_per_utt=64, cond_len=80, n_cc=40,
                          sample_rate=16000, seed=0, partitions=("train",),
                          uneven_lengths=True, interleave=False):
    """Create a fixture corpus under `root`.

    Layout:
      root/wav/<spk><utt>.wav
      root/cond/<spk><utt>.{cc,lf0,gv}
      root/wav_<partition>.list

    Speaker names are 2-digit prefixes ('71', '72', ...) matching the
    reference's first-2-chars speaker-id convention (ref dataset.py:73-76).
    Returns (wav_dir, cond_dir, list of utterance names).
    """
    rng = np.random.RandomState(seed)
    wav_dir = os.path.join(root, "wav")
    cond_dir = os.path.join(root, "cond")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(cond_dir, exist_ok=True)

    names = []
    for s in range(n_speakers):
        spk = f"{71 + s}"
        f_base = 100.0 + 40.0 * s
        for u in range(utts_per_speaker):
            name = f"{spk}u{u:03d}"
            names.append(name)
            nf = frames_per_utt + (rng.randint(-4, 5) if uneven_lengths else 0)
            n_samp = nf * cond_len
            extra = 0
            if uneven_lengths:
                # a partial final frame, like Ahocoder output: audio has
                # nf*cond_len + extra samples (0 <= extra < cond_len) and the
                # cond tracks cover ceil(samples/cond_len) frames. Exercises
                # the oversize sync logic (ref dataset.py:113-124); values
                # chosen to hit both pad (>=60) and truncate branches while
                # avoiding the reference's oversize==60 double-branch bug.
                extra = int(rng.choice([0, 7, min(cond_len - 1, 30),
                                        min(cond_len - 1, 75)]))
                n_samp += extra
            nf_cond = nf + (1 if extra > 0 else 0)
            t = np.arange(n_samp) / sample_rate
            f0 = f_base * (1.0 + 0.1 * np.sin(2 * np.pi * 0.7 * t))
            audio = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / sample_rate)
            audio += 0.05 * rng.randn(n_samp)
            audio = np.clip(audio, -0.999, 0.999).astype(np.float32)
            write_wav(os.path.join(wav_dir, name + ".wav"), audio, sample_rate)

            cc = rng.randn(nf_cond, n_cc) * 0.5 + s
            np.savetxt(os.path.join(cond_dir, name + ".cc"), cc)

            lf0 = np.log(f_base) + 0.1 * rng.randn(nf_cond)
            voiced = rng.rand(nf_cond) > 0.3
            lf0_track = np.where(voiced, lf0, F0_UNVOICED * 2)
            np.savetxt(os.path.join(cond_dir, name + ".lf0"), lf0_track)

            gv = np.where(voiced, 4000.0 + 500 * rng.randn(nf_cond),
                          GV_UNVOICED / 2)
            np.savetxt(os.path.join(cond_dir, name + ".gv"), gv)

    if interleave:
        # round-robin the speakers so batch-major lane packing (which
        # truncates the corpus tail) never drops a whole speaker — the
        # layout per-speaker (norm_ind) normalization needs
        chunks = [names[s * utts_per_speaker:(s + 1) * utts_per_speaker]
                  for s in range(n_speakers)]
        names = [n for group in zip(*chunks) for n in group]
    for part in partitions:
        with open(os.path.join(root, f"wav_{part}.list"), "w") as fh:
            fh.write("\n".join(names) + "\n")
    return wav_dir, cond_dir, names
