#!/usr/bin/env python
"""Voice conversion end-to-end: synthesize speaker X's conditioner track
under speaker Y's embedding and measure whether the identity actually
moves (VERDICT r03 missing #1 — the one reference capability never
exercised).

This is the entire point of the reference's two variants (ref
doc/Barbany_report.pdf §3.2-3.3, run_samplegan.sh / run_sampleneck.sh;
thesis §3.3 eigen-voice): the conditioner carries the spectral envelope
of the SOURCE speaker, so the plain (identity-head) model is expected to
mostly follow the conditioners and FAIL to convert, while the
GAN/bottleneck heads — trained to strip speaker information from the
conditioner latent — leave identity to the speaker embedding.

Protocol (on a trained real-speech cell from scripts/real_speech_run.py):
  1. sources = the longest original utterance of each of the 6 speakers;
     targets = every speaker id -> a 6x6 conversion matrix per variant.
     Source conditioners are normalized with the SOURCE speaker's
     min/max table (content extraction in the speaker-relative [0,1]
     space the net was trained on — thesis §3.1 norm_ind semantics); the
     TARGET enters only through the embedding (`--spk_list` vs the new
     `--norm_spk_list` of cli/generate.py).
  2. eigen-voice rows (thesis §3.3): the highest- and lowest-pitched
     speakers' tracks under a 0.5/0.5 embedding mix — a new voice whose
     F0 should land between the two.
  3. identity-transfer metrics per (src -> tgt) output:
     - median voiced F0 (frame_f0) vs the NATURAL median F0 of source
       and target: does pitch move to the target's range?
     - long-term spectral identity: L2 distance between the output's
       mean mel-cepstral vector (c1..c24) and each speaker's natural
       mean vector: is the envelope closer to the target's?
     - content proxy: frame-aligned MCD vs the SOURCE recording (timing
       follows the source cond track by construction) — conversion must
       not destroy the content.
     Per source row, Spearman rank of [output median F0 across targets]
     vs [natural median F0 of those targets]: rank rho ~ 1 means the
     embedding controls pitch ordering.

Writes <out>/voice_conversion_report_<label>.json (consumed by
docs/VOICE_CONVERSION.md) and copies a few converted WAVs to samples/.

Usage:
  python scripts/voice_conversion_run.py --cell real_speech_sweep/d128_wide_ep450 --label identity
  python scripts/voice_conversion_run.py --cell real_speech_sweep/d128_wide_gan --label gan
  python scripts/voice_conversion_run.py --tiny   # CPU smoke
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


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    d = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / d) if d > 0 else float("nan")


def natural_speaker_stats(wav_dir, per_spk, read_wav, hop=80):
    """{spk: {"f0_median", "cep_mean" (24,), "utts": [...]}} from the
    speakers' ORIGINAL recordings (all of them, not just the source)."""
    from msnv_tpu.eval.metrics import frame_f0, mel_cepstrum

    stats = {}
    for spk, names in per_spk.items():
        f0s, ceps = [], []
        for name in names:
            audio, sr = read_wav(os.path.join(wav_dir, name + ".wav"))
            f0, voiced = frame_f0(audio, sr=sr, hop=hop)
            if voiced.any():
                f0s.append(f0[voiced])
            ceps.append(mel_cepstrum(audio, sr=sr, hop=hop)[:, 1:])
        stats[spk] = {
            "f0_median": float(np.median(np.concatenate(f0s))),
            "cep_mean": np.concatenate(ceps, axis=0).mean(axis=0),
            "utts": list(names),
        }
    return stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cell", default="real_speech_sweep/d128_wide_ep450",
                   help="a trained real_speech_run.py --out directory")
    p.add_argument("--label", default=None,
                   help="report label (default: basename of --cell)")
    p.add_argument("--out", default=None,
                   help="output dir (default: <cell>/voice_conversion)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=77977)
    p.add_argument("--tiny", action="store_true",
                   help="CPU smoke: train a tiny cell first, then convert")
    args = p.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        import subprocess
        cell = "/tmp/vc_tiny_cell"
        if not os.path.isdir(os.path.join(cell, "results")):
            subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__),
                              "real_speech_run.py"),
                 "--tiny", "--out", cell], check=True)
        args.cell = cell
    else:
        from msnv_tpu.utils.profiling import (acquire_chip_lock,
                                              enable_compile_cache)
        enable_compile_cache()
        acquire_chip_lock()   # chip jobs are sequential (round 5)

    from msnv_tpu.cli.generate import main as gen_main
    from msnv_tpu.data.wavio import read_wav
    from msnv_tpu.eval.metrics import frame_f0, mcd, mel_cepstrum

    cell = os.path.abspath(args.cell)
    label = args.label or os.path.basename(cell.rstrip("/"))
    out = os.path.abspath(args.out or os.path.join(cell,
                                                   "voice_conversion"))
    os.makedirs(out, exist_ok=True)
    data_dir = os.path.join(cell, "datasets_real")
    wav_dir = os.path.join(data_dir, "wav")
    results = os.path.join(cell, "results")
    exp_dir = max((os.path.join(results, d) for d in os.listdir(results)),
                  key=os.path.getmtime)
    ckpts = (sorted(glob.glob(os.path.join(exp_dir, "checkpoints",
                                           "best-*")))
             or sorted(glob.glob(os.path.join(exp_dir, "checkpoints",
                                              "ep*-it*")),
                       key=os.path.getmtime))
    model_path = ckpts[-1]

    # originals (exclude augmentation variants), grouped by speaker,
    # sorted by duration — sources are the longest per speaker
    per_spk = {}
    for path in sorted(glob.glob(os.path.join(wav_dir, "*.wav"))):
        name = os.path.basename(path)[:-4]
        if re.search(r"[sg]\d{3}$", name):
            continue
        per_spk.setdefault(name[:2], []).append(name)
    spk_ids = sorted(per_spk)          # corpus order = sorted 2-char ids
    for spk in per_spk:
        per_spk[spk].sort(
            key=lambda n: os.path.getsize(os.path.join(wav_dir,
                                                       n + ".wav")))
    sources = {spk: per_spk[spk][-1] for spk in spk_ids}
    n_spk = len(spk_ids)

    nat = natural_speaker_stats(wav_dir, per_spk, read_wav)
    nat_f0 = {s: nat[s]["f0_median"] for s in spk_ids}
    print(f"cell {label}: ckpt {os.path.basename(model_path)}, speakers "
          f"{spk_ids}, natural median F0 "
          f"{[round(nat_f0[s], 1) for s in spk_ids]}", flush=True)

    # conversion matrix rows: every source utterance under every target
    # embedding, normalized with the SOURCE's table
    rows = []                         # (src_spk_idx, tgt_label, utt)
    for si, s in enumerate(spk_ids):
        for ti in range(n_spk):
            rows.append((si, str(ti), sources[s]))
    # eigen-voice rows: highest- and lowest-pitched speakers, 0.5/0.5 mix
    hi = max(range(n_spk), key=lambda i: nat_f0[spk_ids[i]])
    lo = min(range(n_spk), key=lambda i: nat_f0[spk_ids[i]])
    mix = ["0"] * n_spk
    mix[hi], mix[lo] = "0.5", "0.5"
    mix_label = ",".join(mix)
    for si in (hi, lo):
        rows.append((si, mix_label, sources[spk_ids[si]]))

    cond_list = os.path.join(out, "vc_cond.list")
    spk_list = os.path.join(out, "vc_spk.list")
    norm_list = os.path.join(out, "vc_norm_spk.list")
    with open(cond_list, "w") as f:
        f.write("\n".join(r[2] for r in rows))
    with open(spk_list, "w") as f:
        f.write("\n".join(r[1] for r in rows))
    with open(norm_list, "w") as f:
        f.write("\n".join(str(r[0]) for r in rows))

    gen_out = os.path.join(out, "gen")
    shutil.rmtree(gen_out, ignore_errors=True)
    gen_main([
        "--model", model_path,
        "--cond_path", wav_dir, "--cond_source", "mel",
        "--cond_list", cond_list, "--spk_list", spk_list,
        "--norm_spk_list", norm_list,
        "--min_max", os.path.join(data_dir, "npy_datasets",
                                  "min_max_ind_mel.npy"),
        "--out_dir", gen_out,
        "--temperature", str(args.temperature),
        "--seed", str(args.seed),
    ])

    ckpt_name = os.path.basename(model_path)
    for ext in (".npz", ".orbax"):
        ckpt_name = ckpt_name.removesuffix(ext)

    def out_wav(utt, tgt_label):
        lbl = ("mix" + "-".join(f"{float(w):g}"
                                for w in tgt_label.split(","))
               if "," in tgt_label else tgt_label)
        return os.path.join(gen_out,
                            f"{ckpt_name}_file-{utt}_spk-{lbl}.wav")

    # ---- score the matrix -----------------------------------------------
    matrix = []          # per (src, tgt) dict
    f0_grid = np.full((n_spk, n_spk), np.nan)
    for (si, tgt_label, utt) in rows:
        y, sr = read_wav(out_wav(utt, tgt_label))
        src_audio, _ = read_wav(os.path.join(wav_dir, utt + ".wav"))
        n = min(len(y), len(src_audio))
        f0, voiced = frame_f0(y[:n], sr=sr, hop=80)
        f0_med = float(np.median(f0[voiced])) if voiced.any() else 0.0
        cep = mel_cepstrum(y[:n], sr=sr, hop=80)[:, 1:].mean(axis=0)
        content = mcd(src_audio[:n], y[:n], sr=sr, hop=80)["mcd_db"]
        src_spk = spk_ids[si]
        entry = {
            "source_spk": src_spk,
            "target": tgt_label,
            "utt": utt,
            "out_f0_median_hz": round(f0_med, 1),
            "content_mcd_vs_source_db": round(content, 2),
        }
        if "," not in tgt_label:
            ti = int(tgt_label)
            tgt_spk = spk_ids[ti]
            f0_grid[si, ti] = f0_med
            d_tgt = float(np.linalg.norm(cep - nat[tgt_spk]["cep_mean"]))
            d_src = float(np.linalg.norm(cep - nat[src_spk]["cep_mean"]))
            entry.update({
                "target_spk": tgt_spk,
                "nat_f0_src_hz": round(nat_f0[src_spk], 1),
                "nat_f0_tgt_hz": round(nat_f0[tgt_spk], 1),
                "f0_err_vs_tgt_hz": round(abs(f0_med - nat_f0[tgt_spk]), 1),
                "f0_err_vs_src_hz": round(abs(f0_med - nat_f0[src_spk]), 1),
                "cep_dist_tgt": round(d_tgt, 3),
                "cep_dist_src": round(d_src, 3),
            })
            if ti != si:
                entry["f0_follows_target"] = bool(
                    entry["f0_err_vs_tgt_hz"] < entry["f0_err_vs_src_hz"])
                entry["spec_follows_target"] = bool(d_tgt < d_src)
        matrix.append(entry)

    # per-source rank correlation: output F0 across targets vs the
    # targets' natural F0 — the embedding's pitch control
    nat_vec = np.asarray([nat_f0[s] for s in spk_ids])
    rhos = [spearman(f0_grid[si], nat_vec) for si in range(n_spk)]
    cross = [e for e in matrix if "f0_follows_target" in e]
    eigen = [e for e in matrix if "," in e["target"]]
    eigen_between = None
    if eigen:
        f0_hi, f0_lo = nat_f0[spk_ids[hi]], nat_f0[spk_ids[lo]]
        lo_b, hi_b = min(f0_lo, f0_hi), max(f0_lo, f0_hi)
        eigen_between = [bool(lo_b <= e["out_f0_median_hz"] <= hi_b)
                         for e in eigen]

    report = {
        "run": "voice conversion matrix (scripts/voice_conversion_run.py)"
               " — ref doc/Barbany_report.pdf §3.2-3.3 capability",
        "cell": os.path.relpath(cell, os.getcwd()),
        "label": label,
        "checkpoint": os.path.basename(model_path),
        "temperature": args.temperature,
        "speakers": spk_ids,
        "natural_median_f0_hz": {s: round(nat_f0[s], 1) for s in spk_ids},
        "sources": sources,
        "f0_rank_rho_per_source": [round(r, 3) for r in rhos],
        "f0_rank_rho_mean": round(float(np.nanmean(rhos)), 3),
        "f0_follows_target_rate": round(
            float(np.mean([e["f0_follows_target"] for e in cross])), 3),
        "spec_follows_target_rate": round(
            float(np.mean([e["spec_follows_target"] for e in cross])), 3),
        "content_mcd_vs_source_mean_db": round(
            float(np.mean([e["content_mcd_vs_source_db"]
                           for e in matrix])), 2),
        "copy_synthesis_f0_err_hz_mean": round(
            float(np.mean([e["f0_err_vs_tgt_hz"] for e in matrix
                           if e.get("target_spk") == e["source_spk"]])), 1),
        "eigen_mix": mix_label,
        "eigen_f0_between_components": eigen_between,
        "eigen_rows": eigen,
        "matrix": matrix,
    }
    rpt_path = os.path.join(out, f"voice_conversion_report_{label}.json")
    with open(rpt_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("matrix", "eigen_rows")}, indent=1))
    print("full report:", rpt_path)

    if not args.tiny:
        repo_samples = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "samples")
        # a representative conversion pair: lowest-F0 source -> highest-F0
        # target and vice versa
        for si, ti in ((lo, hi), (hi, lo)):
            src = sources[spk_ids[si]]
            shutil.copy(out_wav(src, str(ti)),
                        os.path.join(repo_samples,
                                     f"vc_{label}_{spk_ids[si]}to"
                                     f"{spk_ids[ti]}.wav"))


if __name__ == "__main__":
    main()
