#!/usr/bin/env python
"""Sampling-temperature study on a trained flagship checkpoint.

Generates one utterance per speaker at several temperatures through the
public generation CLI (same path as gen.sh) and scores each batch with the
objective metrics (eval/metrics.py) against the natural recordings. The
reference has no temperature control (fixed multinomial, ref
model.py:514-517); this documents what the knob buys on real synthesis:
sharper sampling trades diversity for copy-synthesis fidelity and
suppresses the thesis's §4.3 saturation bursts.

Usage (after scripts/flagship_run.py has produced flagship_out/):
  python scripts/temperature_study.py --out flagship_out \
      [--temperatures 1.0 0.8 0.6] [--gen_seconds 3.0]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="flagship_out",
                   help="flagship_run.py output dir (full scale)")
    p.add_argument("--temperatures", nargs="+", type=float,
                   default=[1.0, 0.8, 0.6, 0.4])
    p.add_argument("--gen_seconds", type=float, default=3.0,
                   help="scored audio length per utterance")
    args = p.parse_args()

    from msnv_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from msnv_tpu.cli.generate import main as gen_main
    from msnv_tpu.data.wavio import read_wav
    from msnv_tpu.eval.metrics import evaluate_pair, frame_f0

    out = os.path.abspath(args.out)
    data_dir = os.path.join(out, "datasets_full")
    results = os.path.join(out, "results_full")
    exp_dir = max((os.path.join(results, d) for d in os.listdir(results)),
                  key=os.path.getmtime)
    best = sorted(glob.glob(os.path.join(exp_dir, "checkpoints", "best-*")))
    model_path = best[-1]
    gen_cond = os.path.join(out, "generate_cond.list")
    gen_spk = os.path.join(out, "generate_spk.list")
    names = open(gen_cond).read().split()

    study = {"model": os.path.basename(model_path),
             "gen_seconds": args.gen_seconds, "per_temperature": {}}
    for T in args.temperatures:
        gen_out = os.path.join(out, f"gen_T{T}")
        shutil.rmtree(gen_out, ignore_errors=True)
        t0 = time.time()
        gen_main([
            "--model", model_path,
            "--cond_path", os.path.join(data_dir, "cond"),
            "--cond_list", gen_cond, "--spk_list", gen_spk,
            "--min_max", os.path.join(data_dir, "npy_datasets",
                                      "min_max_ind.npy"),
            "--out_dir", gen_out,
            "--temperature", str(T),
        ])
        wall = time.time() - t0
        scores, f0_med = [], []
        for name in names:
            (w,) = [f for f in os.listdir(gen_out) if name in f]
            audio, sr = read_wav(os.path.join(gen_out, w))
            n = min(audio.shape[0], int(args.gen_seconds * sr))
            ref, _ = read_wav(os.path.join(data_dir, "wav", name + ".wav"))
            scores.append(evaluate_pair(ref[:n], audio[:n], sr=sr))
            f0, voiced = frame_f0(audio[:n], sr=sr)
            f0_med.append(float(np.median(f0[voiced])) if voiced.any()
                          else 0.0)
        agg = {k: round(float(np.mean(
                   [s[k] for s in scores if np.isfinite(s[k])])), 3)
               for k in ("mcd_db", "f0_rmse_hz", "vuv_error_rate")
               if any(np.isfinite(s[k]) for s in scores)}
        agg["yin_f0_median_hz"] = [round(x, 1) for x in f0_med]
        agg["wall_s"] = round(wall, 1)
        study["per_temperature"][str(T)] = agg
        print(f"T={T}: {agg}", flush=True)

    path = os.path.join(out, "temperature_study.json")
    with open(path, "w") as f:
        json.dump(study, f, indent=1)
    print(json.dumps(study, indent=1))


if __name__ == "__main__":
    main()
