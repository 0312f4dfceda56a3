#!/usr/bin/env python
"""Long-horizon NLL-trajectory comparison vs the ACTUAL reference
implementation (ROADMAP quality item).

Both frameworks start from IDENTICAL weights (ours copied into the
reference's torch modules), consume IDENTICAL TBPTT chunks from the same
synthetic multi-speaker corpus (our ChunkLoader feeds both), and take
clipped-Adam steps for --steps iterations. The reference runs torch-CPU
f32; ours runs the compiled train step. Reports per-step loss curves, the
max/mean absolute divergence, and appends a markdown record.

This extends tests/test_reference_parity.py::test_training_trajectory_parity
(5 steps, random data) to hundreds of steps on real corpus statistics —
the longest-horizon optimizer/numerics agreement evidence available
without the private TC-STAR corpus.

Usage: python scripts/trajectory_study.py [--steps 300] [--out docs/TRAJECTORY.md]
"""

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
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
    from msnv_tpu.models.samplernn import init_params, init_tier_state
    from msnv_tpu.training.optim import make_optimizer
    from msnv_tpu.training.step import make_train_step
    from ref_compat import copy_params_to_torch, import_reference_model

    # corpus: small config so torch-CPU keeps up
    root = tempfile.mkdtemp(prefix="traj")
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
    lr = 1e-3

    # identical weights on both sides
    ref_model = import_reference_model()
    tm = ref_model.SampleRNN(
        frame_sizes=list(cfg.frame_sizes), n_rnn=cfg.n_rnn, dim=cfg.dim,
        learn_h0=cfg.learn_h0, q_levels=cfg.q_levels, ulaw=cfg.ulaw,
        weight_norm=False, cond_dim=cfg.effective_cond_dim,
        spk_dim=cfg.spk_dim, qrnn=False)
    params = init_params(jax.random.PRNGKey(7), cfg)
    copy_params_to_torch(params, cfg, tm)
    predictor = ref_model.Predictor(tm)

    sys.path.insert(0, "/root/reference")
    try:
        import nn as ref_nn
        from optim import gradient_clipping
    finally:
        sys.path.remove("/root/reference")
    t_opt = gradient_clipping(torch.optim.Adam(predictor.parameters(),
                                               lr=lr))

    tc = TrainConfig(seq_len=64, batch_size=6, learning_rate=lr,
                     grad_clip=1.0)
    j_opt = make_optimizer(tc)
    j_state = j_opt.init(params)
    step = make_train_step(cfg, j_opt, donate=False)
    state = init_tier_state(cfg, 6)

    ours, ref = [], []
    for k in range(args.steps):
        ch = chunks[k % len(chunks)]
        params, j_state, state, loss = step(
            params, j_state, state, jnp.asarray(ch.data),
            jnp.asarray(ch.reset), jnp.asarray(ch.target),
            jnp.asarray(ch.cond), jnp.asarray(ch.spk))
        ours.append(float(loss))

        def closure():
            out = predictor(torch.from_numpy(
                np.ascontiguousarray(ch.data).astype(np.int64)),
                            bool(ch.reset),
                            torch.from_numpy(ch.cond),
                            torch.from_numpy(
                                ch.spk[:, None].astype(np.int64)), None, k)
            l = ref_nn.sequence_nll_loss_bits(
                out, torch.from_numpy(
                    np.ascontiguousarray(ch.target).astype(np.int64)))
            l.backward()
            return l
        t_opt.zero_grad(set_to_none=False)
        l = t_opt.step(closure)
        ref.append(float(l))
        if k % 50 == 0:
            print(f"step {k}: ours {ours[-1]:.4f} ref {ref[-1]:.4f} "
                  f"|d|={abs(ours[-1]-ref[-1]):.2e}", flush=True)

    d = np.abs(np.asarray(ours) - np.asarray(ref))
    report = {
        "steps": args.steps,
        "final_nll_ours_bits": ours[-1],
        "final_nll_reference_bits": ref[-1],
        "max_abs_divergence_bits": float(d.max()),
        "mean_abs_divergence_bits": float(d.mean()),
        "divergence_at_end_bits": float(d[-1]),
    }
    print(json.dumps(report, indent=1))

    if args.out:
        new = not os.path.isfile(args.out)
        with open(args.out, "a") as f:
            if new:
                f.write(
                    "# NLL-trajectory parity vs the actual reference\n\n"
                    "Same weights, same chunks, same clipped-Adam "
                    "hyperparameters; reference = torch-CPU f32, ours = "
                    "compiled CPU train step "
                    "(scripts/trajectory_study.py).\n")
            f.write(f"\n\n## {args.steps} steps (dim 32, batch 6, "
                    "synthetic 3-speaker corpus)\n\n")
            f.write("| metric | value |\n|---|---|\n")
            for k_, v in report.items():
                f.write(f"| {k_} | {v:.6g} |\n")
        print("appended to", args.out)


if __name__ == "__main__":
    main()
