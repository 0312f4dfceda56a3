#!/usr/bin/env python
"""Flagship-scale validation run, reproducibly (docs/VALIDATION.md
"Flagship-scale end-to-end run" was driven by hand; this scripts it).

Canonical config (frame_sizes 20 4, n_rnn 2, dim 1024, seq_len 1040,
batch 128, look-ahead, per-speaker normalization, 6 speakers) trained on a
synthetic 6-speaker tonal corpus (~15 min, speaker fundamentals
100/140/.../300 Hz) ENTIRELY through the public CLIs, then conditioned
generation one utterance per speaker, and a spectral check: each generated
waveform's dominant FFT peak must land on (rank-correlate 1.0 with) its
speaker's fundamental.

Usage:
  python scripts/flagship_run.py --epochs 30 --out flagship_out
  python scripts/flagship_run.py --tiny          # CPU smoke (~1 min)
"""

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def spectral_peak(audio, sr=16000):
    """Dominant FFT frequency of the waveform (Hz)."""
    spec = np.abs(np.fft.rfft(audio * np.hanning(audio.shape[0])))
    spec[0] = 0.0
    return float(np.fft.rfftfreq(audio.shape[0], 1.0 / sr)[np.argmax(spec)])


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra * ra).sum() * (rb * rb).sum()))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--out", default="flagship_out")
    p.add_argument("--gen_seconds", type=float, default=3.0)
    p.add_argument("--tiny", action="store_true",
                   help="CPU smoke scale (small dim/corpus)")
    p.add_argument("--cond_source", default="ahocoder",
                   choices=["ahocoder", "mel"],
                   help="mel: Ahocoder-free log-mel conditioning "
                        "(data/mel.py) end to end — train + generate")
    args = p.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    from msnv_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    from msnv_tpu.cli.generate import main as gen_main
    from msnv_tpu.cli.train import main as train_main
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    from msnv_tpu.data.wavio import read_wav

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    # scale-specific corpus/results dirs: reusing --out across --tiny and
    # full runs must not silently reuse the other scale's corpus or npy
    # caches (they encode different cond_len/batch/seq geometry)
    scale = "tiny" if args.tiny else "full"
    mel = args.cond_source == "mel"
    data_dir = os.path.join(out, f"datasets_{scale}")
    results = os.path.join(out, f"results_{scale}" + ("_mel" if mel else ""))

    n_spk = 6
    if args.tiny:
        cond_len, frames_per_utt, utts = 16, 60, 2
        model_flags = ["--frame_sizes", "4", "4", "--n_rnn", "1",
                       "--dim", "32", "--seq_len", "64",
                       "--batch_size", "4", "--learning_rate", "2e-3"]
    else:
        # ~15 min of audio: 6 spk x 5 utts x 6000 frames x 80 samples
        cond_len, frames_per_utt, utts = 80, 6000, 5
        model_flags = ["--frame_sizes", "20", "4", "--n_rnn", "2",
                       "--dim", "1024", "--seq_len", "1040",
                       "--batch_size", "128", "--learning_rate", "1e-4",
                       "--bf16", "true"]

    if not os.path.isdir(os.path.join(data_dir, "wav")):
        print("building synthetic corpus ...", flush=True)
        make_synthetic_corpus(
            data_dir, n_speakers=n_spk, utts_per_speaker=utts,
            frames_per_utt=frames_per_utt, cond_len=cond_len,
            partitions=("train", "validation", "test"), interleave=True)

    t0 = time.time()
    cwd = os.getcwd()
    os.chdir(out)   # npy caches land under out/
    try:
        train_main([
            "--exp", "flagship-mel" if mel else "flagship",
            *model_flags,
            "--cond_len", str(cond_len),
            "--look_ahead", "true", "--norm_ind", "true",
            "--ulaw", "true",
            "--cond_source", args.cond_source,
            "--datasets_path", data_dir,
            "--dataset", "wav/", "--cond_set", "cond/",
            "--results_path", results,
            "--epoch_limit", str(args.epochs),
            # objective copy-synthesis trajectory (MCD/F0/V-UV) into
            # stats.json while training
            "--metrics_every", "1" if args.tiny else "5",
        ])
    finally:
        os.chdir(cwd)
    train_wall = time.time() - t0

    # several tags can accumulate under results (reruns with different
    # flags): take the most recently modified one — this run's
    exp_dir = max((os.path.join(results, d) for d in os.listdir(results)),
                  key=os.path.getmtime)
    best = sorted(glob.glob(os.path.join(exp_dir, "checkpoints", "best-*")))
    model_path = best[-1]
    with open(os.path.join(exp_dir, "stats.json")) as f:
        stats = json.load(f)

    # one utterance per speaker; trim the cond list to ~gen_seconds each
    # by pointing at the shortest utterance of each speaker
    wavs = sorted(os.listdir(os.path.join(data_dir, "wav")))
    per_spk = {}
    for w in wavs:
        per_spk.setdefault(w[:2], w[:-4])
    names = [per_spk[k] for k in sorted(per_spk)]
    gen_cond = os.path.join(out, "generate_cond.list")
    gen_spk = os.path.join(out, "generate_spk.list")
    with open(gen_cond, "w") as f:
        f.write("\n".join(names))
    with open(gen_spk, "w") as f:
        f.write("\n".join(str(i) for i in range(len(names))))

    gen_out = os.path.join(out, "gen" + ("_mel" if mel else ""))
    shutil.rmtree(gen_out, ignore_errors=True)
    gen_main([
        "--model", model_path,
        # mel conditioners are computed from the waveforms themselves
        "--cond_path", os.path.join(data_dir, "wav" if mel else "cond"),
        "--cond_source", args.cond_source,
        "--cond_list", gen_cond, "--spk_list", gen_spk,
        "--min_max", os.path.join(
            data_dir, "npy_datasets",
            "min_max_ind_mel.npy" if mel else "min_max_ind.npy"),
        "--out_dir", gen_out,
    ])

    from msnv_tpu.eval.metrics import evaluate_pair, frame_f0

    targets = [100.0 + 40.0 * s for s in range(len(names))]
    peaks, f0_medians, pair_scores = [], [], []
    for i, name in enumerate(names):
        (w,) = [f for f in os.listdir(gen_out) if name in f]
        audio, sr = read_wav(os.path.join(gen_out, w))
        n = min(audio.shape[0], int(args.gen_seconds * sr))
        peaks.append(spectral_peak(audio[:n], sr))
        # objective copy-synthesis scores vs the natural recording
        ref, _ = read_wav(os.path.join(data_dir, "wav", name + ".wav"))
        pair_scores.append(evaluate_pair(ref[:n], audio[:n], sr=sr,
                                         hop=cond_len))
        f0, voiced = frame_f0(audio[:n], sr=sr, hop=cond_len)
        f0_medians.append(float(np.median(f0[voiced])) if voiced.any()
                          else 0.0)
    rho = spearman(np.asarray(peaks), np.asarray(targets))
    rho_f0 = spearman(np.asarray(f0_medians), np.asarray(targets))

    val = [v for v in stats.get("validation_loss", []) if v is not None]
    report = {
        "run": "flagship canonical config via the public CLIs "
               "(scripts/flagship_run.py)",
        "tiny": args.tiny,
        "cond_source": args.cond_source,
        "epochs": args.epochs,
        "train_wall_s": round(train_wall, 1),
        "final_train_nll_bits": [v for v in stats["training_loss"]
                                 if v is not None][-1],
        "val_nll_bits_first_last": [val[0], val[-1]] if val else None,
        "speaker_f0_targets_hz": targets,
        "generated_spectral_peaks_hz": [round(x, 1) for x in peaks],
        "spearman_peak_vs_speaker": rho,
        "generated_yin_f0_median_hz": [round(x, 1) for x in f0_medians],
        "spearman_yin_f0_vs_speaker": rho_f0,
        "copy_synthesis_metrics": {
            k: round(float(np.mean([s[k] for s in pair_scores
                                    if np.isfinite(s[k])])), 3)
            for k in ("mcd_db", "f0_rmse_hz", "vuv_error_rate")
            if any(np.isfinite(s[k]) for s in pair_scores)},
        "objective_metrics_trajectory": {
            k: [round(v, 3) for v in stats[k] if v is not None]
            for k in ("mcd_db", "f0_rmse_hz", "vuv_error_rate")
            if k in stats},
    }
    report_name = ("flagship_report_mel.json" if mel
                   else "flagship_report.json")
    with open(os.path.join(out, report_name), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    ok = rho == 1.0
    print("PASS" if ok else "CHECK: spectral ranking != 1.0")
    if not ok and not args.tiny:
        # full-scale validation MUST rank all six fundamentals correctly;
        # tiny smoke only exercises the mechanics
        sys.exit(1)


if __name__ == "__main__":
    main()
