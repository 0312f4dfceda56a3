"""Offline evaluation CLI: NLL-bits of a checkpoint over corpus partitions.

The reference only evaluates inside training (ValidationPlugin,
ref trainer/plugins.py:26-92); this standalone scorer re-hydrates the model
from the checkpoint's experiment tag and streams any partition.

Usage:
  python -m msnv_tpu.cli.evaluate --model results/<tag>/checkpoints/ep...npz \
      --datasets_path <dir> [--partitions validation test]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from msnv_tpu.config import parse_tag
    from msnv_tpu.data.corpus import CorpusConfig, build_corpus
    from msnv_tpu.data.loader import ChunkLoader
    from msnv_tpu.models.samplernn import init_params, init_tier_state
    from msnv_tpu.training.checkpoint import load_any as load_checkpoint
    from msnv_tpu.training.step import make_eval_step

    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--datasets_path", required=True)
    p.add_argument("--dataset", default="wav/")
    p.add_argument("--cond_set", default="cond/")
    p.add_argument("--partitions", nargs="+",
                   default=["validation", "test"])
    args = p.parse_args(argv)

    from msnv_tpu.config import tag_from_checkpoint_path
    tag = tag_from_checkpoint_path(args.model)
    cfg = parse_tag(tag)
    m = cfg.model
    print("config from tag:", tag)

    params = init_params(jax.random.PRNGKey(0), m)
    state, meta = load_checkpoint(args.model, {"params": params})
    params = state["params"]

    ccfg = CorpusConfig(
        datasets_path=args.datasets_path,
        wav_path=os.path.join(args.datasets_path, args.dataset),
        cond_path=os.path.join(args.datasets_path, args.cond_set),
        overlap_len=m.lookback, q_levels=m.q_levels, ulaw=m.ulaw,
        seq_len=cfg.train.seq_len, batch_size=cfg.train.batch_size,
        cond_dim=m.cond_dim, cond_len=m.cond_len,
        norm_ind=cfg.data.norm_ind, look_ahead=m.look_ahead,
        cache_dir=os.path.join(args.datasets_path, "npy_datasets"))

    eval_step = make_eval_step(m)
    out = {}
    for part in args.partitions:
        corpus = build_corpus(ccfg, part)
        loader = ChunkLoader(corpus, cfg.train.seq_len, m.lookback,
                             m.cond_len, m.q_levels, m.ulaw)
        state_h = init_tier_state(m, loader._qdata.shape[0])
        from msnv_tpu.training.trainer import Trainer
        if loader.device_bytes() <= Trainer.DEVICE_CORPUS_MAX_BYTES:
            # device-resident corpus + multi-step executables: one
            # dispatch + one loss fetch per 16 chunks; the uploaded
            # corpus is released before the next partition uploads
            from msnv_tpu.training.step import eval_device_corpus
            nll, state_h = eval_device_corpus(m, params, state_h, loader)
        else:
            total, n = 0.0, 0
            for chunk in loader.epoch():
                loss, state_h = eval_step(
                    params, state_h, jnp.asarray(chunk.data),
                    jnp.asarray(chunk.reset), jnp.asarray(chunk.target),
                    jnp.asarray(chunk.cond), jnp.asarray(chunk.spk))
                b = chunk.data.shape[0]
                total += float(loss) * b
                n += b
            nll = total / max(n, 1)
        out[part] = {"nll_bits": nll, "perplexity": 2.0 ** nll,
                     "chunks": len(loader)}
        print(f"{part}: NLL {nll:.4f} bits, perplexity {2.0**nll:.2f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
