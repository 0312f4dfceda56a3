#!/usr/bin/env python
"""End-to-end quality demo: learn a synthetic tonal corpus, then generate.

Trains a small 2-tier model on the synthetic multi-speaker corpus (each
speaker = a different fundamental frequency), reports the NLL trajectory,
generates conditioned audio for each speaker, and checks that the generated
waveform's spectrum peaks near the speaker's fundamental — i.e. the whole
pipeline (data -> TBPTT training -> checkpoint -> conditioned generation)
actually learns and synthesizes structured audio, not noise.

Usage: python scripts/demo_e2e.py [--epochs 30] [--out demo_out]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--out", default="demo_out")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from msnv_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from msnv_tpu.data.corpus import CorpusConfig, build_corpus
    from msnv_tpu.data.loader import ChunkLoader
    from msnv_tpu.data.synthetic import make_synthetic_corpus
    from msnv_tpu.data.wavio import write_wav
    from msnv_tpu.models.generate import generate_fn
    from msnv_tpu.models.samplernn import init_params
    from msnv_tpu.training.optim import make_optimizer
    from msnv_tpu.training.trainer import Trainer

    root = tempfile.mkdtemp(prefix="msnv_demo_")
    cond_len = 16
    make_synthetic_corpus(root, n_speakers=2, utts_per_speaker=4,
                          frames_per_utt=400, cond_len=cond_len,
                          uneven_lengths=False)
    ccfg = CorpusConfig(
        datasets_path=root, wav_path=os.path.join(root, "wav"),
        cond_path=os.path.join(root, "cond"), overlap_len=16,
        seq_len=160, batch_size=8, cond_len=cond_len, norm_ind=False,
        cache_dir=os.path.join(root, "npy"))
    corpus = build_corpus(ccfg, "train")
    loader = ChunkLoader(corpus, 160, 16, cond_len)
    print(f"corpus: {corpus.data.shape[1]} samples/lane, "
          f"{len(loader)} chunks/epoch")

    m = ModelConfig(frame_sizes=(4, 4), n_rnn=2, dim=args.dim, cond_dim=43,
                    cond_len=cond_len, spk_dim=2)
    cfg = ExperimentConfig(
        exp="demo", model=m,
        train=TrainConfig(seq_len=160, batch_size=8, learning_rate=2e-3))
    params = init_params(jax.random.PRNGKey(0), m)
    trainer = Trainer(cfg, params, make_optimizer(cfg.train), loader)

    losses = []
    for epoch in range(1, args.epochs + 1):
        epoch_losses = []
        for chunk in loader.epoch():
            epoch_losses.append(float(trainer.train_chunk(chunk)))
        losses.append(float(np.mean(epoch_losses)))
        if epoch % 5 == 0 or epoch == 1:
            print(f"epoch {epoch}: NLL {losses[-1]:.3f} bits")

    # conditioned generation: real cond frames from each speaker's stream
    os.makedirs(args.out, exist_ok=True)
    gen = generate_fn(trainer.params, m)
    frames = 100  # 100*16 = 1600 samples = 0.1 s
    lanes = {int(corpus.spk[i, 0]): i for i in range(corpus.spk.shape[0])}
    report = {"nll_first": losses[0], "nll_last": losses[-1]}
    ok = True
    for spk_id, lane in sorted(lanes.items()):
        cond = jnp.asarray(corpus.cond[lane, 1:1 + frames][None],
                           jnp.float32)
        audio, _ = gen(cond, jnp.asarray([spk_id], jnp.int32),
                       jax.random.PRNGKey(spk_id))
        wav = np.asarray(audio[0])
        path = os.path.join(args.out, f"demo_spk{spk_id}.wav")
        write_wav(path, wav, 16000)

        # spectral check: energy peak near the speaker's fundamental
        spec = np.abs(np.fft.rfft(wav * np.hanning(wav.size)))
        freqs = np.fft.rfftfreq(wav.size, 1 / 16000)
        peak = float(freqs[np.argmax(spec[5:])] + freqs[5])
        expected = 100.0 + 40.0 * spk_id  # synthetic.py f_base
        report[f"spk{spk_id}"] = {"peak_hz": peak, "expected_hz": expected,
                                  "wav": path}
        good = abs(peak - expected) < expected * 0.5
        ok = ok and good
        print(f"spk {spk_id}: spectral peak {peak:.0f} Hz "
              f"(expected ~{expected:.0f} Hz) {'OK' if good else 'OFF'}")

    report["learned"] = losses[-1] < losses[0] - 2.0
    report["spectra_ok"] = ok
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    assert report["learned"], "NLL did not drop by 2+ bits"
    assert report["spectra_ok"], (
        "generated spectra off their speaker fundamentals — the pipeline "
        "trained but synthesis regressed")


if __name__ == "__main__":
    main()
