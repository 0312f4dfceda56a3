#!/usr/bin/env python
"""bottle-neck variant study (ROADMAP quality item; thesis §3.2.1).

The reference's bottle-neck variant narrows the conditioner stack
(43->40->30->20->ind_cond_dim) to force a low-dimensional
speaker-independent code for voice conversion (run_sampleneck.sh uses
--ind_cond_dim 30; the thesis motivates dims as low as 10). This script
quantifies the mechanism on the synthetic fixture corpus (speakers differ
in f0, so the raw conditioners genuinely carry speaker identity):

For the identity head (baseline) and bottleneck heads at several
ind_cond_dim values it trains the vocoder for --steps TBPTT steps and
reports:
  - nll_bits: final vocoder loss (EMA) — lower = better vocoder
  - probe_nll: a fresh probe discriminator trained post-hoc on the frozen
    conditioner code (the bottleneck latent; the raw normalized cond for
    the identity baseline). HIGHER = less speaker info recoverable =
    stronger voice-conversion prior. Chance = ln(n_spk) nats.

Usage: python scripts/bottleneck_study.py [--steps 240] [--out docs/BOTTLENECK_STUDY.md]
"""

import argparse
import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--probe_steps", type=int, default=200)
    ap.add_argument("--out", default=None, help="append a markdown table")
    args = ap.parse_args()

    import jax
    # must run BEFORE anything initializes the backend (calling
    # jax.default_backend() first would make this a silent no-op)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from msnv_tpu.config import ModelConfig, TrainConfig
    from msnv_tpu.data.corpus import CorpusConfig, build_corpus
    from msnv_tpu.data.loader import ChunkLoader
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    from msnv_tpu.models.discriminator import (discriminator_init,
                                               discriminator_nll)
    from msnv_tpu.models.samplernn import (init_params, init_tier_state,
                                           predictor_apply)
    from msnv_tpu.training.optim import make_optimizer
    from msnv_tpu.training.step import make_train_step

    root = tempfile.mkdtemp(prefix="bneckstudy")
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

    heads = [
        ("identity (baseline)", "identity", None),
        ("bottleneck d=8", "bottleneck", 8),
        ("bottleneck d=4", "bottleneck", 4),
        ("bottleneck d=2", "bottleneck", 2),
    ]

    rows = []
    for name, variant, d in heads:
        m = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=32, cond_dim=43,
                        cond_len=16, spk_dim=n_spk, variant=variant,
                        ind_cond_dim=d or 1)
        tc = TrainConfig(seq_len=64, batch_size=6, learning_rate=2e-3)
        params = init_params(jax.random.PRNGKey(0), m)
        opt = make_optimizer(tc)
        ostate = opt.init(params)
        state = init_tier_state(m, 6)
        step = make_train_step(m, opt)
        nll = None
        for i in range(args.steps):
            ch = chunks[i % len(chunks)]
            params, ostate, state, loss = step(
                params, ostate, state, jnp.asarray(ch.data),
                jnp.asarray(ch.reset), jnp.asarray(ch.target),
                jnp.asarray(ch.cond), jnp.asarray(ch.spk))
            l = float(loss)
            nll = l if nll is None else 0.95 * nll + 0.05 * l

        # conditioner code to probe: bottleneck latent, or raw cond for
        # the identity baseline (its head has no intermediate code)
        def code_of(ch):
            if variant == "identity":
                return np.asarray(ch.cond, np.float32)
            _, _, latent = predictor_apply(
                params, m, jnp.asarray(ch.data), jnp.asarray(True),
                jnp.asarray(ch.cond), jnp.asarray(ch.spk),
                init_tier_state(m, 6))
            return np.asarray(latent)

        codes = [code_of(ch) for ch in chunks]

        probe = discriminator_init(jax.random.PRNGKey(7), n_spk, channels=8)
        popt = optax.adam(2e-3)
        pst = popt.init(probe)

        @jax.jit
        def probe_step(probe, pst, latent, spk):
            def loss(pp):
                return discriminator_nll(pp, latent, spk)
            l, g = jax.value_and_grad(loss)(probe)
            up, pst2 = popt.update(g, pst, probe)
            return optax.apply_updates(probe, up), pst2, l

        pl = None
        for i in range(args.probe_steps):
            ch = chunks[i % len(chunks)]
            probe, pst, l = probe_step(probe, pst,
                                       jnp.asarray(codes[i % len(chunks)]),
                                       jnp.asarray(ch.spk))
            pl = float(l) if pl is None else 0.9 * pl + 0.1 * float(l)

        chance = math.log(n_spk)
        rows.append((name, nll, pl, chance))
        print(f"{name:22s}: nll={nll:.3f} bits, probe={pl:.3f} "
              f"(chance {chance:.3f} nats)", flush=True)

    if args.out:
        new = not os.path.isfile(args.out)
        with open(args.out, "a") as f:
            if new:
                f.write("# Bottle-neck variant study\n\n"
                        "Mechanism check for the thesis §3.2.1 variant "
                        "(see scripts/bottleneck_study.py): how much "
                        "speaker information a post-hoc probe recovers "
                        "from the conditioner code as the bottleneck "
                        "narrows, vs the vocoder NLL cost.\n")
            f.write(f"\n\n## Results (synthetic corpus, {args.steps} "
                    "steps, dim=32)\n\n")
            f.write("| head | vocoder NLL (bits) | post-hoc probe NLL "
                    "(nats) | chance (nats) |\n|---|---|---|---|\n")
            for name, nll, pl, ch in rows:
                f.write(f"| {name} | {nll:.3f} | {pl:.3f} | {ch:.3f} |\n")
        print(f"appended results to {args.out}")


if __name__ == "__main__":
    main()
