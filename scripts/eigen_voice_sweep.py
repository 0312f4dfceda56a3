#!/usr/bin/env python
"""Eigen-voice interpolation sweep (thesis §3.3, round 4).

The voice-conversion matrix (scripts/voice_conversion_run.py) checks one
0.5/0.5 embedding mix; this sweep traces the whole interpolation path:
for the best-converting high-quality cell (bottleneck), synthesize a
fixed source conditioner track under speaker-embedding mixes
w·target + (1−w)·source for w ∈ {0, 0.25, 0.5, 0.75, 1} between the
lowest- and highest-pitched speakers, both directions, and record the
output median F0. The eigen-voice claim is that embedding space
interpolates: F0 should move monotonically from the source's natural
median toward the target's as w grows.

Writes docs/eigen_voice_sweep.json.
Usage: python scripts/eigen_voice_sweep.py [--cell real_speech_sweep/d128_wide_ep450_neck]
"""

import argparse
import glob
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WEIGHTS = (0.0, 0.25, 0.5, 0.75, 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cell", default="real_speech_sweep/d128_wide_ep450_neck")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "eigen_voice_sweep.json"))
    args = p.parse_args()

    from msnv_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from msnv_tpu.cli.generate import main as gen_main
    from msnv_tpu.data.wavio import read_wav
    from msnv_tpu.eval.metrics import frame_f0

    cell = os.path.abspath(args.cell)
    data_dir = os.path.join(cell, "datasets_real")
    wav_dir = os.path.join(data_dir, "wav")
    results = os.path.join(cell, "results")
    exp_dir = max((os.path.join(results, d) for d in os.listdir(results)),
                  key=os.path.getmtime)
    ckpts = sorted(glob.glob(os.path.join(exp_dir, "checkpoints",
                                          "ep*-it*")), key=os.path.getmtime)
    model_path = ckpts[-1]

    per_spk = {}
    for path in sorted(glob.glob(os.path.join(wav_dir, "*.wav"))):
        name = os.path.basename(path)[:-4]
        if re.search(r"[sg]\d{3}$", name):
            continue
        per_spk.setdefault(name[:2], []).append(name)
    spk_ids = sorted(per_spk)
    n_spk = len(spk_ids)

    nat_f0 = {}
    for spk, names in per_spk.items():
        f0s = []
        for name in names:
            audio, sr = read_wav(os.path.join(wav_dir, name + ".wav"))
            f0, voiced = frame_f0(audio, sr=sr, hop=80)
            if voiced.any():
                f0s.append(f0[voiced])
        nat_f0[spk] = float(np.median(np.concatenate(f0s)))
    lo = min(range(n_spk), key=lambda i: nat_f0[spk_ids[i]])
    hi = max(range(n_spk), key=lambda i: nat_f0[spk_ids[i]])
    longest = {s: max(per_spk[s], key=lambda nm: os.path.getsize(
        os.path.join(wav_dir, nm + ".wav"))) for s in spk_ids}

    rows = []        # (src_idx, tgt_idx, w, utt)
    for src, tgt in ((lo, hi), (hi, lo)):
        for w in WEIGHTS:
            rows.append((src, tgt, w, longest[spk_ids[src]]))

    out_dir = os.path.join(cell, "eigen_sweep")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    cond_list = os.path.join(out_dir, "cond.list")
    spk_list = os.path.join(out_dir, "spk.list")
    norm_list = os.path.join(out_dir, "norm.list")
    with open(cond_list, "w") as f:
        f.write("\n".join(r[3] for r in rows))
    with open(spk_list, "w") as f:
        for src, tgt, w, _ in rows:
            mix = [0.0] * n_spk
            mix[src] += 1.0 - w
            mix[tgt] += w
            f.write(",".join(f"{x:g}" for x in mix) + "\n")
    with open(norm_list, "w") as f:
        f.write("\n".join(str(r[0]) for r in rows))

    gen_out = os.path.join(out_dir, "gen")
    gen_main([
        "--model", model_path,
        "--cond_path", wav_dir, "--cond_source", "mel",
        "--cond_list", cond_list, "--spk_list", spk_list,
        "--norm_spk_list", norm_list,
        "--min_max", os.path.join(data_dir, "npy_datasets",
                                  "min_max_ind_mel.npy"),
        "--out_dir", gen_out,
    ])

    ckpt_name = os.path.basename(model_path)
    for ext in (".npz", ".orbax"):
        ckpt_name = ckpt_name.removesuffix(ext)
    curves = {}
    for src, tgt, w, utt in rows:
        mix = [0.0] * n_spk
        mix[src] += 1.0 - w
        mix[tgt] += w
        # integer-equivalent one-hot mixes generate via the same float
        # mix path and carry the same mix-style label (cli/generate.py)
        lbl = "mix" + "-".join(f"{x:g}" for x in mix)
        wav_path = os.path.join(gen_out,
                                f"{ckpt_name}_file-{utt}_spk-{lbl}.wav")
        y, sr = read_wav(wav_path)
        f0, voiced = frame_f0(y, sr=sr, hop=80)
        f0_med = float(np.median(f0[voiced])) if voiced.any() else 0.0
        key = f"{spk_ids[src]}->{spk_ids[tgt]}"
        curves.setdefault(key, []).append(
            {"w_target": w, "out_f0_median_hz": round(f0_med, 1)})

    def mono(vals, increasing):
        d = np.diff(vals)
        return bool((d >= -2.0).all() if increasing else (d <= 2.0).all())

    report = {
        "study": "eigen-voice interpolation sweep "
                 "(scripts/eigen_voice_sweep.py; thesis §3.3)",
        "cell": os.path.relpath(cell, os.getcwd()),
        "checkpoint": os.path.basename(model_path),
        "natural_median_f0_hz": {s: round(nat_f0[s], 1) for s in spk_ids},
        "weights": list(WEIGHTS),
        "curves": curves,
        "monotone_within_2hz": {
            k: mono([r["out_f0_median_hz"] for r in v],
                    nat_f0[k.split("->")[1]] > nat_f0[k.split("->")[0]])
            for k, v in curves.items()},
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
