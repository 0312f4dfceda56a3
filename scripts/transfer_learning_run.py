#!/usr/bin/env python
"""Transfer learning: can synthetic pretraining break the 127 s data
floor? (VERDICT r03 missing #3 / next-round item 2.)

The reference trained on 5.25 h of TC-STAR (doc/paper.pdf §3); this
environment has only the 20 released WAVs (127 s), and round-3
augmentation saturated at MCD ~32.2-32.5 dB (docs/REAL_SPEECH.md). The
one untried lever: pretrain on an UNLIMITED speech-like synthetic corpus
(data/synthetic.make_speechlike_corpus — source-filter syllable trains
with per-speaker F0 / vocal-tract / tilt identities), then warm-start
the real-speech fine-tune (the `--model` params-only warm start, ref
train.py:224-233 semantics).

Protocol:
  1. stage a synthetic corpus: 6 speakers (matching spk_dim), N utts x
     S seconds each (default 6 x 50 x 8 s = 40 min — ~19x the real
     corpus).
  2. pretrain the canonical dim-128 recipe (mel conditioning, norm_ind,
     bf16) for --pretrain_epochs.
  3. fine-tune on the augmented real corpus at the frontier recipe via
     scripts/real_speech_run.py --warm_start (wide x9 grid, 450 epochs)
     — the report lands as real_speech_report_dim128_ep450_aug_tl.json
     and compares directly against the from-scratch
     real_speech_report_dim128_wide_ep450.json cell (MCD 32.5).

Usage:
  python scripts/transfer_learning_run.py --out real_speech_sweep/d128_tl
  python scripts/transfer_learning_run.py --tiny    # CPU smoke
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="real_speech_sweep/d128_tl")
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--pretrain_epochs", type=int, default=100)
    p.add_argument("--pretrain_utts", type=int, default=50,
                   help="utterances per speaker in the synthetic corpus")
    p.add_argument("--utt_seconds", type=float, default=8.0)
    p.add_argument("--finetune_epochs", type=int, default=450)
    p.add_argument("--skip_finetune", action="store_true",
                   help="stage + pretrain only (fine-tune run separately)")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        from msnv_tpu.utils.profiling import (acquire_chip_lock,
                                              enable_compile_cache)
        enable_compile_cache()
        acquire_chip_lock()   # chip jobs are sequential (round 5)

    from msnv_tpu.cli.train import main as train_main
    from msnv_tpu.data.synthetic import make_speechlike_corpus

    out = os.path.abspath(args.out)
    pre_dir = os.path.join(out, "pretrain_data")
    pre_results = os.path.join(out, "pretrain_results")
    os.makedirs(out, exist_ok=True)

    n_spk, utts, secs = 6, args.pretrain_utts, args.utt_seconds
    if args.tiny:
        utts, secs = 2, 2.0
    if not os.path.isfile(os.path.join(pre_dir, "wav_train.list")):
        t0 = time.time()
        make_speechlike_corpus(pre_dir, n_speakers=n_spk,
                               utts_per_speaker=utts,
                               seconds_per_utt=secs, seed=11)
        print(f"staged synthetic corpus: {n_spk}x{utts}x{secs:.0f}s = "
              f"{n_spk * utts * secs / 60:.1f} min "
              f"({time.time() - t0:.0f}s)", flush=True)

    if args.tiny:
        model_flags = ["--frame_sizes", "4", "4", "--n_rnn", "1",
                       "--dim", "32", "--seq_len", "80",
                       "--batch_size", "8", "--learning_rate", "2e-3",
                       "--cond_len", "16"]
        pre_epochs = 2
    else:
        model_flags = ["--frame_sizes", "20", "4", "--n_rnn", "2",
                       "--dim", str(args.dim), "--seq_len", "1040",
                       "--batch_size", "16", "--learning_rate", "1e-4",
                       "--bf16", "true", "--cond_len", "80"]
        pre_epochs = args.pretrain_epochs

    # ---- pretrain -------------------------------------------------------
    t0 = time.time()
    cwd = os.getcwd()
    os.chdir(out)        # npy caches under out/
    try:
        train_main([
            "--exp", "tl-pretrain", *model_flags,
            "--look_ahead", "true", "--norm_ind", "true",
            "--ulaw", "true", "--cond_source", "mel",
            "--datasets_path", pre_dir,
            "--dataset", "wav/", "--cond_set", "wav/",
            "--results_path", pre_results,
            "--epoch_limit", str(pre_epochs),
            "--ckpt_every", "1" if args.tiny else "20",
        ])
    finally:
        os.chdir(cwd)
    pre_wall = time.time() - t0
    exp_dir = max((os.path.join(pre_results, d)
                   for d in os.listdir(pre_results)),
                  key=os.path.getmtime)
    ckpts = sorted(glob.glob(os.path.join(exp_dir, "checkpoints",
                                          "ep*-it*")),
                   key=os.path.getmtime)
    pre_ckpt = ckpts[-1]
    with open(os.path.join(exp_dir, "stats.json")) as f:
        pre_stats = json.load(f)
    pre_nll = [v for v in pre_stats["training_loss"] if v is not None]
    summary = {
        "pretrain_corpus_min": round(n_spk * utts * secs / 60, 1),
        "pretrain_epochs": pre_epochs,
        "pretrain_wall_s": round(pre_wall, 1),
        "pretrain_nll_bits_first_last": [round(pre_nll[0], 3),
                                         round(pre_nll[-1], 3)],
        "pretrain_checkpoint": pre_ckpt,
    }
    print(json.dumps(summary, indent=1), flush=True)
    with open(os.path.join(out, "pretrain_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)

    if args.skip_finetune:
        return

    # ---- fine-tune on the real corpus at the frontier recipe ------------
    ft_cmd = [sys.executable,
              os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "real_speech_run.py"),
              "--out", os.path.join(out, "finetune"),
              "--warm_start", pre_ckpt]
    if args.tiny:
        ft_cmd += ["--tiny"]
    else:
        ft_cmd += ["--dim", str(args.dim),
                   "--epochs", str(args.finetune_epochs),
                   "--augment_speeds", "0.85,0.9,0.95,1.05,1.1,1.15",
                   "--augment_gains", "0.79,1.26"]
    print("fine-tune:", " ".join(ft_cmd), flush=True)
    rc = subprocess.run(ft_cmd).returncode
    if rc > 1:           # 1 = the CHECK gate; >1 = real failure
        sys.exit(rc)


if __name__ == "__main__":
    main()
