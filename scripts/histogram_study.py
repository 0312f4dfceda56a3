#!/usr/bin/env python
"""Waveform-distribution parity at TRAINED weights (ROADMAP quality item:
"µ-law histogram KL vs reference checkpoints once a shared trained
checkpoint exists" — this script creates that shared checkpoint).

1. Trains our model for --steps clipped-Adam steps on the synthetic
   multi-speaker corpus (CPU f32).
2. Copies the trained weights into the ACTUAL reference implementation.
3. Generates stochastically from BOTH (reference per-sample Python loop
   with torch.multinomial; our nested-scan generator with
   jax.random.categorical) on the same conditioners.
4. Compares µ-law level histograms: symmetric KL between the two
   frameworks, against a same-framework different-seed KL as the
   sampling-noise floor. Matching distributions = cross KL ~ noise floor.

RNG streams differ by construction (torch vs jax), so sequences cannot
match; the claim under test is distribution-level equivalence of the
learned sampler.

Usage: python scripts/histogram_study.py [--steps 300] [--frames 100]
          [--out docs/TRAJECTORY.md]
"""

import argparse
import contextlib
import io
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def hist_kl(a_levels, b_levels, q=256):
    """Symmetric KL between add-one-smoothed level histograms."""
    ha = np.bincount(a_levels, minlength=q).astype(np.float64) + 1.0
    hb = np.bincount(b_levels, minlength=q).astype(np.float64) + 1.0
    pa, pb = ha / ha.sum(), hb / hb.sum()
    return float(0.5 * (np.sum(pa * np.log(pa / pb))
                        + np.sum(pb * np.log(pb / pa))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch
    torch.manual_seed(0)

    from msnv_tpu.config import ModelConfig, TrainConfig
    from msnv_tpu.data.corpus import CorpusConfig, build_corpus
    from msnv_tpu.data.loader import ChunkLoader
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    from msnv_tpu.models.generate import generate_fn
    from msnv_tpu.models.samplernn import init_params, init_tier_state
    from msnv_tpu.ops.quantize import udequantize
    from msnv_tpu.training.optim import make_optimizer
    from msnv_tpu.training.step import make_train_step
    from ref_compat import copy_params_to_torch, import_reference_model

    root = tempfile.mkdtemp(prefix="hist")
    n_spk = 3
    make_synthetic_corpus(root, n_speakers=n_spk, utts_per_speaker=3,
                          frames_per_utt=200, cond_len=16)
    ccfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"), overlap_len=16, seq_len=64,
        batch_size=6, cond_len=16, norm_ind=False,
        cache_dir=os.path.join(root, "npy"))
    corpus = build_corpus(ccfg, "train")
    loader = ChunkLoader(corpus, 64, 16, 16)
    chunks = [loader.get_chunk(k) for k in range(len(loader))]

    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=32, cond_dim=43,
                      cond_len=16, spk_dim=n_spk)
    tc = TrainConfig(seq_len=64, batch_size=6, learning_rate=1e-3)

    # --- train ours ---
    params = init_params(jax.random.PRNGKey(7), cfg)
    opt = make_optimizer(tc)
    ostate = opt.init(params)
    state = init_tier_state(cfg, 6)
    step = make_train_step(cfg, opt, donate=False)
    for k in range(args.steps):
        ch = chunks[k % len(chunks)]
        params, ostate, state, loss = step(
            params, ostate, state, jnp.asarray(ch.data),
            jnp.asarray(ch.reset), jnp.asarray(ch.target),
            jnp.asarray(ch.cond), jnp.asarray(ch.spk))
    print(f"trained {args.steps} steps, final NLL {float(loss):.3f} bits",
          flush=True)

    # --- shared checkpoint: same trained weights into the reference ---
    ref_model = import_reference_model()
    tm = ref_model.SampleRNN(
        frame_sizes=list(cfg.frame_sizes), n_rnn=cfg.n_rnn, dim=cfg.dim,
        learn_h0=cfg.learn_h0, q_levels=cfg.q_levels, ulaw=cfg.ulaw,
        weight_norm=False, cond_dim=cfg.effective_cond_dim,
        spk_dim=cfg.spk_dim, qrnn=False)
    copy_params_to_torch(params, cfg, tm)
    gen_ref = ref_model.Generator(tm, cuda=False)

    frames = args.frames
    gen_ours = generate_fn(params, cfg)

    # levels must be recovered EXACTLY: re-quantizing the dequantized float
    # output hits the mu-law bin-edge drift quirk (ops/quantize.py)
    # differently under torch-f32 vs numpy-f64 rounding and fabricates
    # ~0.1 nats of KL. Nearest level center is rounding-robust (half-bin
    # tolerance vs ~1e-7 float noise); ours returns levels directly.
    grid = np.asarray(udequantize(np.arange(cfg.q_levels), cfg.q_levels),
                      np.float64)

    def to_levels(wav):
        return np.argmin(np.abs(np.asarray(wav, np.float64)[:, None]
                                - grid[None, :]), axis=1)

    all_ref, all_ours, all_ref2 = [], [], []
    for lane in range(6):
        cond = np.asarray(corpus.cond[lane, 1:1 + frames], np.float32)
        spk = int(np.argmax(np.bincount(
            corpus.spk[lane, 1:1 + frames].astype(int))))
        with contextlib.redirect_stdout(io.StringIO()):
            with torch.no_grad():
                torch.manual_seed(100 + lane)
                wav_ref = gen_ref(1, frames * cfg.lookback, cond,
                                  spk).numpy()[0]
                torch.manual_seed(900 + lane)   # noise-floor twin
                wav_ref2 = gen_ref(1, frames * cfg.lookback, cond,
                                   spk).numpy()[0]
        _audio, seq = gen_ours(jnp.asarray(cond[None]),
                               jnp.asarray([spk], jnp.int32),
                               jax.random.PRNGKey(lane))
        lv_ref = to_levels(wav_ref)
        lv_ref2 = to_levels(wav_ref2)
        lv_ours = np.asarray(seq[0])
        all_ref.append(lv_ref)
        all_ref2.append(lv_ref2)
        all_ours.append(lv_ours)
        print(f"lane {lane} spk {spk}: cross-KL "
              f"{hist_kl(lv_ref, lv_ours):.4f}  noise-floor "
              f"{hist_kl(lv_ref, lv_ref2):.4f}", flush=True)

    ref_all = np.concatenate(all_ref)
    ours_all = np.concatenate(all_ours)
    ref2_all = np.concatenate(all_ref2)
    report = {
        "train_steps": args.steps,
        "samples_per_framework": int(ref_all.shape[0]),
        "kl_reference_vs_ours": hist_kl(ref_all, ours_all),
        "kl_reference_seed_noise_floor": hist_kl(ref_all, ref2_all),
    }
    print(json.dumps(report, indent=1))

    if args.out:
        with open(args.out, "a") as f:
            f.write(f"\n\n## µ-law histogram KL at trained weights "
                    f"({args.steps} steps, {report['samples_per_framework']}"
                    " samples/framework)\n\n"
                    "Stochastic generation from the SAME trained weights "
                    "(scripts/histogram_study.py): symmetric KL between "
                    "µ-law level histograms.\n\n")
            f.write("| comparison | symmetric KL (nats) |\n|---|---|\n")
            f.write(f"| reference vs ours (cross-framework) | "
                    f"{report['kl_reference_vs_ours']:.4f} |\n")
            f.write(f"| reference vs reference, different seed "
                    f"(noise floor) | "
                    f"{report['kl_reference_seed_noise_floor']:.4f} |\n")
        print("appended to", args.out)


if __name__ == "__main__":
    main()
