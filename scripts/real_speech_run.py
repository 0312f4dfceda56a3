#!/usr/bin/env python
"""Real-speech end-to-end study: train the canonical vocoder on the
reference's released sample WAVs and score copy-synthesis objectively.

TC-STAR (the reference's training corpus, doc/paper.pdf S3) is private,
but the reference repo ships 20 real 16 kHz speech recordings — outputs of
its best checkpoint (samples/best-ep334-it632930_*.wav, SURVEY.md S2.10) —
covering all 6 speakers (72/73/75/76/79/80, ~127 s total). Those are real
multi-speaker speech with the exact speaker set, so they make an honest
(if small) corpus for the one remaining quality item the synthetic
flagship runs can't cover: does the full pipeline learn REAL speech?

Protocol (everything through the public CLIs, like scripts/flagship_run.py):
  1. stage the WAVs as <spk>u<idx>.wav under out/datasets_real/wav/ and
     write wav_{train,validation,test}.list (train = all 20; val/test =
     the shortest utterance per speaker — with ~2 min of audio this is a
     capacity/fidelity study, not a generalization claim, and the report
     says so).
  2. train the canonical config (frame_sizes 20 4, n_rnn 2, dim 1024,
     seq_len 1040, look-ahead, per-speaker normalization) with the
     Ahocoder-free log-mel conditioning (data/mel.py) — Ahocoder itself
     is an external binary not present here.
  3. copy-synthesize the longest utterance of each speaker conditioned on
     the natural recording's mel track, and score MCD dB / YIN F0 RMSE /
     V-UV error vs the natural recording (eval/metrics.py), plus a
     per-speaker F0-ranking Spearman (generated vs natural median F0).

PASS = per-speaker median-F0 rank correlation >= 0.8 and finite MCD on
every speaker. Writes out/real_speech_report.json and copies the
generated WAVs to samples/real_speech_*.wav.

Usage:
  python scripts/real_speech_run.py --epochs 150 --out real_speech_out
  python scripts/real_speech_run.py --tiny     # CPU smoke (~2 min)
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


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra * ra).sum() * (rb * rb).sum()))


def stage_corpus(wav_src, data_dir, read_wav, write_wav):
    """Reference sample WAVs -> <spk>u<idx>.wav + partition lists.

    Returns {spk: [(name, seconds), ...]} sorted by duration."""
    wav_dir = os.path.join(data_dir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    per_spk = {}
    for path in sorted(glob.glob(os.path.join(wav_src, "*.wav"))):
        base = os.path.basename(path)
        if "spk-" not in base:
            print(f"skipping {base}: no 'spk-<id>' tag in the filename")
            continue
        # speaker token up to the extension; the corpus convention needs
        # a 2-char prefix (ref dataset.py:73-76), so zero-pad short ids.
        # Longer tokens don't fit the convention — refuse rather than
        # truncate, which would silently merge distinct speakers.
        token = base.split("spk-")[1].split(".")[0]
        if len(token) > 2:
            raise SystemExit(
                f"{base}: speaker token '{token}' is longer than the "
                f"2-char corpus convention (ref dataset.py:73-76) — "
                f"rename sources to 2-char speaker ids")
        spk = token.zfill(2)
        idx = len(per_spk.get(spk, []))
        name = f"{spk}u{idx:03d}"
        audio, sr = read_wav(path)
        if sr != 16000:
            raise SystemExit(f"{base}: expected 16 kHz, got {sr}")
        # re-encode as PCM16 (sources are float32 WAVs)
        write_wav(os.path.join(wav_dir, name + ".wav"), audio, sr)
        per_spk.setdefault(spk, []).append((name, len(audio) / sr))
    for spk in per_spk:
        per_spk[spk].sort(key=lambda t: t[1])
    # round-robin across speakers: lane packing truncates the TAIL of the
    # concatenated stream (ref dataset.py:143-163), and a speaker-blocked
    # list would drop the last speakers entirely (norm_ind needs every
    # speaker to survive truncation)
    train, rank = [], 0
    while any(rank < len(utts) for utts in per_spk.values()):
        for spk in sorted(per_spk):
            if rank < len(per_spk[spk]):
                train.append(per_spk[spk][rank][0])
        rank += 1
    heldout = sorted(utts[0][0] for utts in per_spk.values())  # shortest/spk
    for part, names in (("train", train), ("validation", heldout),
                        ("test", heldout)):
        with open(os.path.join(data_dir, f"wav_{part}.list"), "w") as f:
            f.write("\n".join(names) + "\n")
    return per_spk


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--out", default="real_speech_out")
    p.add_argument("--wav_src", default="/root/reference/samples")
    # 127 s of audio packs into at most ~22 full lanes at seq_len 1040
    # (corpus.py enforces batch*(seq_len+overlap)*cond_len geometry)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--dim", type=int, default=1024,
                   help="model width: 1024 = canonical (60M params, "
                        "heavily over-parameterized for 127 s); smaller "
                        "dims probe the capacity/data trade-off")
    p.add_argument("--norm_ind", default="true",
                   help="per-speaker (true) vs joint (false) conditioner "
                        "normalization — the thesis's headline ablation "
                        "(doc/paper.pdf Table 1)")
    p.add_argument("--augment_speeds", default="",
                   help="comma-separated speed-perturb factors (e.g. "
                        "'0.9,1.1') — stages sox-style resampled variants "
                        "of every train utterance (data/augment.py), "
                        "multiplying the 127 s corpus; eval targets stay "
                        "the natural recordings")
    p.add_argument("--augment_gains", default="",
                   help="comma-separated gain-perturb factors (e.g. '0.79')")
    p.add_argument("--variant", default="identity",
                   choices=("identity", "bottleneck", "gan"),
                   help="conditioner head (ref run_samplegan.sh / "
                        "run_sampleneck.sh); gan adds the adversarial "
                        "speaker-disentanglement objective and a post-hoc "
                        "probe report (docs/GAN_STUDY.md methodology)")
    p.add_argument("--ind_cond_dim", type=int, default=50)
    p.add_argument("--lambda_weight", nargs=3, type=float,
                   default=[0.0, 0.01, 5000.0],
                   help="GAN lambda ramp start/target/ramp_steps — default "
                        "ramps over ~1/3 of a 150-epoch run on the "
                        "augmented 127 s corpus (~96 steps/epoch), unlike "
                        "the ref's 50k which would never engage here")
    p.add_argument("--lambda_adaptive", nargs=3, type=float, default=None,
                   metavar=("TARGET_NLL", "GAIN", "MAX_MULT"),
                   help="adaptive GAN lambda controller (variant=gan): "
                        "hold the in-loop disc NLL near TARGET_NLL by "
                        "scaling the ramped lambda (see cli/train.py). "
                        "Queued frontier cell: ln(spk)/2 2.0 100 at the "
                        "450-epoch budget (docs/VOICE_CONVERSION.md)")
    p.add_argument("--probe_steps", type=int, default=300,
                   help="post-hoc probe training steps (variant=gan)")
    p.add_argument("--warm_start", default=None,
                   help="checkpoint path to warm-start from (params only, "
                        "same architecture — the transfer-learning path: "
                        "pretrain on a synthetic corpus, fine-tune here; "
                        "scripts/transfer_learning_run.py orchestrates)")
    p.add_argument("--ss_prob", type=float, default=0.0,
                   help="scheduled-sampling probability (exposure-bias "
                        "study, round 5 — config.TrainConfig.ss_prob)")
    p.add_argument("--input_noise", type=float, default=0.0,
                   help="input-level noise probability")
    p.add_argument("--ckpt_every", type=int, default=10,
                   help="checkpoint thinning (epochs); the per-epoch "
                        "device->host checkpoint fetch dominates epoch "
                        "wall-clock on this 127 s corpus")
    p.add_argument("--metrics_every", type=int, default=25,
                   help="in-training objective-metrics cadence (epochs); "
                        "each eval costs ~1-2 min of chip wall (free-"
                        "running generation), ~2k s over a 450-epoch "
                        "cell — thin it when scheduling is tight")
    p.add_argument("--tiny", action="store_true",
                   help="CPU smoke scale (small dim, 2 epochs)")
    args = p.parse_args()
    if args.warm_start:
        # absolutify before the os.chdir(out) below
        args.warm_start = os.path.abspath(args.warm_start)

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        # TPU only: CPU AOT cache entries are machine-feature-specific
        # (loading one compiled on a different host risks SIGILL — same
        # guard as __graft_entry__.dryrun_multichip)
        from msnv_tpu.utils.profiling import (acquire_chip_lock,
                                              enable_compile_cache)
        enable_compile_cache()
        # ONE chip job at a time (see acquire_chip_lock's docstring for
        # the round-5 wedge incident this prevents)
        acquire_chip_lock()

    from msnv_tpu.cli.generate import main as gen_main
    from msnv_tpu.cli.train import main as train_main
    from msnv_tpu.data.wavio import read_wav, write_wav

    out = os.path.abspath(args.out)
    data_dir = os.path.join(out, "datasets_real")
    results = os.path.join(out, "results")
    os.makedirs(out, exist_ok=True)

    per_spk = stage_corpus(args.wav_src, data_dir, read_wav, write_wav)
    total_s = sum(d for utts in per_spk.values() for _, d in utts)
    print(f"staged {sum(map(len, per_spk.values()))} utterances, "
          f"{total_s:.1f}s, speakers {sorted(per_spk)}", flush=True)

    speeds = tuple(float(s) for s in args.augment_speeds.split(",") if s)
    gains = tuple(float(g) for g in args.augment_gains.split(",") if g)
    if speeds or gains:
        from msnv_tpu.data.augment import augment_corpus
        train_list = augment_corpus(data_dir, speeds=speeds, gains=gains,
                                    read_wav=read_wav, write_wav=write_wav)
        print(f"augmented train list: {len(train_list)} utterances "
              f"(speeds {speeds}, gains {gains})", flush=True)

    if args.tiny:
        epochs = 2
        # cond_len == lookback (16) so the conditioner is genuinely
        # per-top-tier-frame (cond_len 80 with lookback 16 only typechecks
        # because a single cond frame broadcasts), and the 5 cond frames
        # per chunk satisfy the GAN discriminator's reflect-pad-2 minimum
        model_flags = ["--frame_sizes", "4", "4", "--n_rnn", "1",
                       "--dim", "32", "--seq_len", "80",
                       "--batch_size", "8", "--learning_rate", "2e-3"]
    else:
        epochs = args.epochs
        model_flags = ["--frame_sizes", "20", "4", "--n_rnn", "2",
                       "--dim", str(args.dim), "--seq_len", "1040",
                       "--batch_size", str(args.batch_size),
                       "--learning_rate", "1e-4", "--bf16", "true"]

    t0 = time.time()
    cwd = os.getcwd()
    os.chdir(out)   # npy caches land under out/
    try:
        norm_ind = args.norm_ind.lower().startswith("t")
        variant_flags = []
        if args.variant != "identity":
            variant_flags = ["--variant", args.variant,
                             "--ind_cond_dim", str(args.ind_cond_dim)]
            if args.variant == "gan":
                variant_flags += ["--lambda_weight",
                                  *(str(x) for x in args.lambda_weight)]
                if args.lambda_adaptive is not None:
                    variant_flags += ["--lambda_adaptive",
                                      *(str(x) for x in args.lambda_adaptive)]
                if args.tiny:
                    # the thesis-spec 512-channel discriminator costs
                    # minutes/step on a 2-vCPU box — shrink for the smoke
                    variant_flags += ["--disc_channels", "16"]
        warm_flags = (["--model", args.warm_start]
                      if args.warm_start else [])
        if args.ss_prob > 0:
            variant_flags += ["--ss_prob", str(args.ss_prob)]
        if args.input_noise > 0:
            variant_flags += ["--input_noise", str(args.input_noise)]
        train_main([
            "--exp", "real-speech",
            *model_flags, *variant_flags, *warm_flags,
            "--cond_len", "16" if args.tiny else "80",
            "--look_ahead", "true",
            "--norm_ind", "true" if norm_ind else "false",
            "--ulaw", "true",
            "--cond_source", "mel",
            "--datasets_path", data_dir,
            "--dataset", "wav/", "--cond_set", "wav/",
            "--results_path", results,
            "--epoch_limit", str(epochs),
            "--ckpt_every", "1" if args.tiny else str(args.ckpt_every),
            "--metrics_every", ("1" if args.tiny
                                else str(args.metrics_every)),
        ])
    finally:
        os.chdir(cwd)
    train_wall = time.time() - t0

    exp_dir = max((os.path.join(results, d) for d in os.listdir(results)),
                  key=os.path.getmtime)
    # best-* needs a validation partition (the 127 s corpus can't pack
    # one at this batch geometry) — fall back to the newest epoch save
    ckpts = (sorted(glob.glob(os.path.join(exp_dir, "checkpoints",
                                           "best-*")))
             or sorted(glob.glob(os.path.join(exp_dir, "checkpoints",
                                              "ep*-it*")),
                       key=os.path.getmtime))
    model_path = ckpts[-1]
    with open(os.path.join(exp_dir, "stats.json")) as f:
        stats = json.load(f)

    # copy-synthesis targets: the LONGEST utterance per speaker
    names = [per_spk[s][-1][0] for s in sorted(per_spk)]
    gen_cond = os.path.join(out, "generate_cond.list")
    gen_spk = os.path.join(out, "generate_spk.list")
    with open(gen_cond, "w") as f:
        f.write("\n".join(names))
    with open(gen_spk, "w") as f:
        f.write("\n".join(str(i) for i in range(len(names))))

    suffix = "" if args.dim == 1024 else f"_dim{args.dim}"
    if not norm_ind:
        suffix += "_joint"
    if epochs != 150 and not args.tiny:
        suffix += f"_ep{epochs}"
    if speeds or gains:
        suffix += "_aug"
    if args.warm_start:
        suffix += "_tl"       # transfer learning (warm-started)
    if args.ss_prob > 0:
        suffix += f"_ss{args.ss_prob:g}"
    if args.input_noise > 0:
        suffix += f"_in{args.input_noise:g}"
    if args.variant != "identity":
        suffix += f"_{args.variant}"
        if args.variant == "gan" and args.lambda_weight[1] == 0.0:
            suffix += "0"        # lambda-0 control (architecture, no adversary)
        if args.variant == "gan" and args.lambda_adaptive is not None:
            suffix += "_ad"      # adaptive-lambda controller cell
    gen_out = os.path.join(out, "gen" + suffix)
    shutil.rmtree(gen_out, ignore_errors=True)
    gen_main([
        "--model", model_path,
        "--cond_path", os.path.join(data_dir, "wav"),  # mel from waveforms
        "--cond_source", "mel",
        "--cond_list", gen_cond, "--spk_list", gen_spk,
        "--min_max", os.path.join(
            data_dir, "npy_datasets",
            f"min_max_{'ind' if norm_ind else 'joint'}_mel.npy"),
        "--out_dir", gen_out,
    ])

    from msnv_tpu.eval.metrics import evaluate_pair, frame_f0

    pair_scores, f0_gen, f0_nat = [], [], []
    repo_samples = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "samples")
    for i, name in enumerate(names):
        (w,) = [f for f in os.listdir(gen_out) if name in f]
        gen, sr = read_wav(os.path.join(gen_out, w))
        nat, _ = read_wav(os.path.join(data_dir, "wav", name + ".wav"))
        n = min(len(gen), len(nat))
        pair_scores.append(evaluate_pair(nat[:n], gen[:n], sr=sr, hop=80))
        for audio, acc in ((gen[:n], f0_gen), (nat[:n], f0_nat)):
            f0, voiced = frame_f0(audio, sr=sr, hop=80)
            acc.append(float(np.median(f0[voiced])) if voiced.any() else 0.0)
        if not args.tiny:
            shutil.copy(os.path.join(gen_out, w),
                        os.path.join(repo_samples,
                                     f"real_speech{suffix}_{name}.wav"))
    rho_f0 = spearman(np.asarray(f0_gen), np.asarray(f0_nat))

    # variant=gan/bottleneck: post-hoc speaker-probe disentanglement score
    # (docs/GAN_STUDY.md methodology: the in-loop discriminator NLL
    # overstates disentanglement, so train a FRESH probe on the frozen
    # final latent and report its NLL vs chance = ln(n_speakers)); for the
    # bottleneck variant the probe measures how much speaker info the
    # narrowing alone removes (thesis sec 3.2.1 vs 3.2.2 comparison)
    probe_report = None
    if args.variant in ("gan", "bottleneck"):
        import math

        import jax as _jax
        import jax.numpy as jnp
        import optax

        from msnv_tpu.config import parse_tag
        from msnv_tpu.data.corpus import CorpusConfig, build_corpus
        from msnv_tpu.data.loader import ChunkLoader
        from msnv_tpu.models.discriminator import (discriminator_init,
                                                   discriminator_nll)
        from msnv_tpu.models.samplernn import (init_params, init_tier_state,
                                               predictor_apply)
        from msnv_tpu.training.checkpoint import load_any

        cfg_full = parse_tag(os.path.basename(exp_dir))
        mcfg = cfg_full.model
        template = {"params": init_params(_jax.random.PRNGKey(0), mcfg)}
        ckpt_state, _ = load_any(model_path, template)
        tparams = ckpt_state["params"]
        ccfg = CorpusConfig(
            datasets_path=data_dir, wav_path=os.path.join(data_dir, "wav"),
            cond_path=os.path.join(data_dir, "wav"),
            overlap_len=mcfg.lookback, q_levels=mcfg.q_levels,
            ulaw=mcfg.ulaw, seq_len=cfg_full.train.seq_len,
            batch_size=cfg_full.train.batch_size, cond_dim=mcfg.cond_dim,
            cond_len=mcfg.cond_len, norm_ind=norm_ind,
            look_ahead=mcfg.look_ahead,
            cache_dir=os.path.join(data_dir, "npy_datasets"),
            cond_source="mel")
        pcorpus = build_corpus(ccfg, "train")
        ploader = ChunkLoader(pcorpus, cfg_full.train.seq_len, mcfg.lookback,
                              mcfg.cond_len, mcfg.q_levels, mcfg.ulaw)
        n_chunks = min(len(ploader), 24)
        pstate = init_tier_state(mcfg, cfg_full.train.batch_size)
        lat_cache, spk_cache = [], []
        for k in range(n_chunks):
            ch = ploader.get_chunk(k)
            _, pstate, latent = predictor_apply(
                tparams, mcfg, jnp.asarray(ch.data), jnp.asarray(ch.reset),
                jnp.asarray(ch.cond), jnp.asarray(ch.spk), pstate)
            lat_cache.append(np.asarray(latent))
            spk_cache.append(np.asarray(ch.spk))
        probe = discriminator_init(
            _jax.random.PRNGKey(7), mcfg.spk_dim, channels=32)
        popt = optax.adam(1e-3)
        pst = popt.init(probe)

        @_jax.jit
        def probe_step(probe, pst, latent, spk):
            l, g = _jax.value_and_grad(
                lambda pp: discriminator_nll(pp, latent, spk))(probe)
            up, pst2 = popt.update(g, pst, probe)
            return optax.apply_updates(probe, up), pst2, l

        pl = None
        for i in range(args.probe_steps):
            j = i % n_chunks
            probe, pst, l = probe_step(probe, pst, jnp.asarray(lat_cache[j]),
                                       jnp.asarray(spk_cache[j]))
            pl = float(l) if pl is None else 0.9 * pl + 0.1 * float(l)
        probe_report = {
            "probe_nll_nats": round(pl, 4),
            "chance_nll_nats": round(math.log(mcfg.spk_dim), 4),
            "probe_steps": args.probe_steps,
            "probe_chunks": n_chunks,
            "lambda_weight": (list(args.lambda_weight)
                              if args.variant == "gan" else None),
            "in_loop_disc_nll_last": (
                [v for v in stats["disc_loss"] if v is not None][-1]
                if "disc_loss" in stats and
                any(v is not None for v in stats["disc_loss"]) else None),
        }
        print(f"post-hoc probe NLL {pl:.3f} nats "
              f"(chance {math.log(mcfg.spk_dim):.3f})", flush=True)

    val = [v for v in stats.get("validation_loss", []) if v is not None]
    mcds = [s["mcd_db"] for s in pair_scores]
    report = {
        "run": "real-speech study: canonical config + mel conditioning on "
               "the reference's 20 released sample WAVs "
               "(scripts/real_speech_run.py)",
        "caveat": "train == eval utterances (127s corpus): a fidelity/"
                  "capacity study on real speech, not a generalization "
                  "claim; the source WAVs are themselves outputs of the "
                  "reference's best checkpoint",
        "tiny": args.tiny,
        "dim": args.dim,
        "norm_ind": norm_ind,
        "epochs": epochs,
        "augment_speeds": list(speeds),
        "augment_gains": list(gains),
        "warm_start": args.warm_start,
        "corpus_seconds": round(total_s, 1),
        "train_seconds_with_augment": round(
            total_s * (1 + len(gains) + sum(1 / s for s in speeds)), 1),
        "train_wall_s": round(train_wall, 1),
        "final_train_nll_bits": [v for v in stats["training_loss"]
                                 if v is not None][-1],
        "val_nll_bits_first_last": [val[0], val[-1]] if val else None,
        "eval_utterances": names,
        "natural_median_f0_hz": [round(x, 1) for x in f0_nat],
        "generated_median_f0_hz": [round(x, 1) for x in f0_gen],
        "spearman_f0_gen_vs_natural": rho_f0,
        "copy_synthesis_metrics_mean": {
            k: round(float(np.mean([s[k] for s in pair_scores
                                    if np.isfinite(s[k])])), 3)
            for k in ("mcd_db", "f0_rmse_hz", "vuv_error_rate",
                      "burst_fraction", "clip_fraction")
            if any(np.isfinite(s[k]) for s in pair_scores)},
        "per_speaker_mcd_db": [round(float(x), 2) for x in mcds],
        "saturation_bursts_total": int(sum(s["n_bursts"]
                                           for s in pair_scores)),
        "objective_metrics_trajectory": {
            k: [round(v, 3) for v in stats[k] if v is not None]
            for k in ("mcd_db", "f0_rmse_hz", "vuv_error_rate",
                      "burst_fraction")
            if k in stats},
        "variant": args.variant,
        "speaker_probe": probe_report,
    }
    with open(os.path.join(out, f"real_speech_report{suffix}.json"),
              "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    ok = rho_f0 >= 0.8 and all(np.isfinite(mcds))
    print("PASS" if ok else
          f"CHECK: f0 rank {rho_f0:.2f} / mcd finite {np.isfinite(mcds)}")
    if not ok and not args.tiny:
        sys.exit(1)


if __name__ == "__main__":
    main()
