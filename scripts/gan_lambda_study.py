#!/usr/bin/env python
"""samplernn-gan lambda-ramp sensitivity study (ROADMAP quality item).

The reference's GAN variant (run_samplegan.sh --lambda_weight 0 0.01 50000)
never documents why that schedule; this script measures how the adversarial
weight schedule trades vocoder NLL against speaker disentanglement of the
conditioner latent, on the synthetic fixture corpus (speakers differ in f0,
so the conditioners genuinely carry speaker identity).

For each schedule it trains the gan-variant model for --steps TBPTT steps
and reports:
  - nll_bits: final vocoder loss (EMA) — lower = better vocoder
  - disc_nll: final discriminator speaker-classification loss on the latent
    (nats; chance = ln(n_spk); HIGHER = latent carries less speaker info)
  - probe_nll: a FRESH probe discriminator trained post-hoc on the frozen
    final latent — the honest disentanglement metric (the in-loop disc can
    lag the conditioner).

Usage: python scripts/gan_lambda_study.py [--steps 240] [--out docs/GAN_STUDY.md]
"""

import argparse
import math
import os
import sys

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
    from msnv_tpu.config import ModelConfig, TrainConfig
    from msnv_tpu.data.corpus import CorpusConfig, build_corpus
    from msnv_tpu.data.loader import ChunkLoader
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    from msnv_tpu.models.discriminator import (discriminator_init,
                                               discriminator_nll)
    from msnv_tpu.models.samplernn import init_params, init_tier_state
    from msnv_tpu.training.gan import make_gan_train_step
    from msnv_tpu.training.optim import make_optimizer
    import optax

    import tempfile
    root = tempfile.mkdtemp(prefix="ganstudy")
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

    m = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=32, cond_dim=43,
                    cond_len=16, spk_dim=n_spk, variant="gan",
                    ind_cond_dim=8)

    # (name, lambda_weight, lambda_adaptive): the round-5 adaptive rows pit
    # the disc-NLL controller against its fixed-lambda twin at equal base
    # schedule — target ln(3)/2 nats (half chance), gain 2, clip 100x.
    tgt = math.log(3.0) / 2
    schedules = [
        ("no adversary", (0.0, 0.0, 1.0), None),
        ("canonical 0->0.01", (0.0, 0.01, args.steps * 0.5), None),
        ("strong 0->0.1", (0.0, 0.1, args.steps * 0.5), None),
        ("immediate 0.1", (0.1, 0.1, 1.0), None),
        ("adaptive 0.01", (0.01, 0.01, 1.0), (tgt, 2.0, 100.0)),
        ("fixed 0.01 (adaptive control)", (0.01, 0.01, 1.0), None),
    ]

    def latent_of(params, cfg, chunk, state):
        from msnv_tpu.models.samplernn import predictor_apply
        _, _, latent = predictor_apply(
            params, cfg, jnp.asarray(chunk.data), jnp.asarray(True),
            jnp.asarray(chunk.cond), jnp.asarray(chunk.spk), state)
        return latent

    rows = []
    for name, lw, la in schedules:
        tc = TrainConfig(seq_len=64, batch_size=6, learning_rate=2e-3,
                         lambda_weight=lw, lambda_adaptive=la)
        params = init_params(jax.random.PRNGKey(0), m)
        disc = discriminator_init(jax.random.PRNGKey(1), n_spk, channels=8)
        main_opt, disc_opt = make_optimizer(tc), make_optimizer(tc)
        mo, do = main_opt.init(params), disc_opt.init(disc)
        state = init_tier_state(m, 6)
        step = make_gan_train_step(m, tc, main_opt, disc_opt)
        nll = disc_nll = eff_lam = None
        for i in range(args.steps):
            ch = chunks[i % len(chunks)]
            params, disc, mo, do, state, met = step(
                params, disc, mo, do, state, jnp.asarray(float(i)),
                jnp.asarray(ch.data), jnp.asarray(ch.reset),
                jnp.asarray(ch.target), jnp.asarray(ch.cond),
                jnp.asarray(ch.spk))
            l1, l2 = float(met["loss"]), float(met["disc_loss"])
            lm = float(met["lambda"])
            nll = l1 if nll is None else 0.95 * nll + 0.05 * l1
            disc_nll = l2 if disc_nll is None else 0.95 * disc_nll + 0.05 * l2
            eff_lam = lm if eff_lam is None else 0.95 * eff_lam + 0.05 * lm

        # post-hoc probe: fresh discriminator on the FROZEN final latent
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

        lat_cache = [np.asarray(latent_of(params, m, ch,
                                          init_tier_state(m, 6)))
                     for ch in chunks]
        pl = None
        for i in range(args.probe_steps):
            ch = chunks[i % len(chunks)]
            lat = jnp.asarray(lat_cache[i % len(chunks)])
            probe, pst, l = probe_step(probe, pst, lat,
                                       jnp.asarray(ch.spk))
            pl = float(l) if pl is None else 0.9 * pl + 0.1 * float(l)

        chance = math.log(n_spk)   # disc NLL is in nats
        rows.append((name, lw, nll, disc_nll, pl, chance, eff_lam))
        print(f"{name:30s} lambda={lw} adaptive={la}: nll={nll:.3f} bits, "
              f"disc={disc_nll:.3f}, probe={pl:.3f}, eff_lam={eff_lam:.4f} "
              f"(chance {chance:.3f} nats)", flush=True)

    if args.out:
        with open(args.out, "a") as f:
            f.write("\n\n## Results (synthetic corpus, "
                    f"{args.steps} steps, dim=32)\n\n")
            f.write("| schedule | lambda (start, target, ramp) | vocoder "
                    "NLL (bits) | in-loop disc NLL (nats) | post-hoc probe NLL (nats) | "
                    "chance (nats) | final eff. lambda (EMA) |\n"
                    "|---|---|---|---|---|---|---|\n")
            for name, lw, nll, dn, pl, ch, el in rows:
                f.write(f"| {name} | {lw} | {nll:.3f} | {dn:.3f} | "
                        f"{pl:.3f} | {ch:.3f} | {el:.4f} |\n")
        print(f"appended results to {args.out}")


if __name__ == "__main__":
    main()
