#!/usr/bin/env python
"""Measure the reference implementation's throughput on this machine.

Runs the ACTUAL reference code (imported read-only from /root/reference,
torch CPU — the only hardware here that can run it; the reference published
no throughput numbers at all, SURVEY.md §6) at the canonical samplernn
config, and records:

- generation: samples/s and audio-seconds/s of Generator.__call__
  (the per-sample Python loop, ref model.py:462-517)
- training: samples/s of Predictor forward+backward+clipped-Adam on a
  (batch, 1040) TBPTT chunk (ref trainer/__init__.py:62-117)

Writes reference_baseline.json at the repo root; bench.py reads it for
vs_baseline. Run once: `python scripts/measure_reference_baseline.py`.
"""

import contextlib
import io
import json
import os
import sys
import time

import numpy as np
import torch

# The reference's speaker-embedding debug dump (ref model.py:209-214)
# crashes for batch > 1 (`spk.reshape(1)` on a (B,1) tensor) on any torch
# version — a latent bug in the uploaded code. For throughput measurement we
# import a copy of model.py with ONLY those debug lines excised; nn.py and
# utils.py are imported unmodified from /root/reference.
_PATCH_DIR = "/tmp/refpatch"


def _make_patched_model():
    os.makedirs(_PATCH_DIR, exist_ok=True)
    src = open("/root/reference/model.py").read()
    lines = src.splitlines(keepends=True)
    # excise the filename/np.savetxt debug block (0-indexed lines 208-213)
    patched = "".join(lines[:208]) + "".join(lines[214:])
    assert "np.savetxt" not in patched
    with open(os.path.join(_PATCH_DIR, "model.py"), "w") as f:
        f.write(patched)


_make_patched_model()
sys.path.insert(0, "/root/reference")
sys.path.insert(0, _PATCH_DIR)

torch.manual_seed(0)


def build_reference_model(dim=1024, n_rnn=2, cond_dim=86, spk_dim=6):
    import model as ref_model
    m = ref_model.SampleRNN(
        frame_sizes=[20, 4], n_rnn=n_rnn, dim=dim, learn_h0=True,
        q_levels=256, ulaw=True, weight_norm=False, cond_dim=cond_dim,
        spk_dim=spk_dim, qrnn=False)
    return ref_model, m


def bench_generation(ref_model, m, frames=6, runs=2):
    gen = ref_model.Generator(m, cuda=False)
    cond = np.random.rand(frames, m.cond_dim).astype(np.float32)
    times = []
    for _ in range(runs):
        # the reference prints one line per generated sample; silence it so
        # we time compute, not stdout
        with contextlib.redirect_stdout(io.StringIO()):
            t0 = time.perf_counter()
            with torch.no_grad():
                gen(1, frames * 80, cond, 0)
            times.append(time.perf_counter() - t0)
    n_samples = frames * 80
    dt = min(times)
    return {
        "samples_per_s": n_samples / dt,
        "audio_s_per_s": n_samples / 16000.0 / dt,
        "n_samples": n_samples,
        "wall_s": dt,
    }


def bench_training(ref_model, m, batch=32, seq_len=1040, iters=3):
    import nn as ref_nn
    from optim import gradient_clipping
    predictor = ref_model.Predictor(m)
    optimizer = gradient_clipping(
        torch.optim.Adam(predictor.parameters(), lr=1e-4))
    data = torch.randint(0, 256, (batch, seq_len + 79))
    target = torch.randint(0, 256, (batch, seq_len))
    cond = torch.rand(batch, seq_len // 80, m.cond_dim)
    spk = torch.zeros(batch, 1, dtype=torch.long)
    times = []
    for i in range(iters + 1):
        t0 = time.perf_counter()

        def closure():
            out = predictor(data, i == 0, cond, spk, None, i)
            loss = ref_nn.sequence_nll_loss_bits(out, target)
            loss.backward()
            return loss

        # torch-0.4 semantics: zero_grad kept zero tensors (set_to_none
        # arrived later); the reference's grad clipper assumes that
        optimizer.zero_grad(set_to_none=False)
        with contextlib.redirect_stdout(io.StringIO()):
            optimizer.step(closure)
        if i > 0:  # skip warmup
            times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "samples_per_s": batch * seq_len / dt,
        "batch": batch,
        "seq_len": seq_len,
        "wall_s_per_step": dt,
    }


def main():
    os.chdir("/tmp")  # the reference dumps <spk>.txt files into cwd
    ref_model, m = build_reference_model()
    n_params = sum(p.numel() for p in m.parameters())
    print(f"reference model built: {n_params/1e6:.1f}M params", flush=True)
    gen = bench_generation(ref_model, m)
    print("generation:", gen, flush=True)
    train = bench_training(ref_model, m)
    print("training:", train, flush=True)
    out = {
        "hardware": "cpu (torch, 2 vCPU)",
        "note": ("reference published no perf numbers; measured by running "
                 "the actual reference code (torch CPU) at the canonical "
                 "samplernn config (frame_sizes 20,4, n_rnn 2, dim 1024, "
                 "cond 86, 6 spk)"),
        "generation": gen,
        "training": train,
        "torch_version": torch.__version__,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reference_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
