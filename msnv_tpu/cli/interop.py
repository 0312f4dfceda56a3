"""Checkpoint interop CLI: bring reference torch checkpoints here / export
ours back (msnv_tpu/interop.py has the verified layout mapping).

Usage:
  # reference -> msnv_tpu (then msnv-generate / msnv-evaluate / msnv-serve)
  python -m msnv_tpu.cli.interop import \
      --torch_ckpt results/<tag>/checkpoints/best-ep334-it632930 \
      [--tag <tag>] [--out <path.npz>]

  # msnv_tpu -> reference state_dict file
  python -m msnv_tpu.cli.interop export \
      --model results/<tag>/checkpoints/ep10-it820.npz \
      [--tag <tag>] [--out <path.pt>]

The model config comes from the experiment tag, read from the checkpoint's
results/<tag>/checkpoints/ parent (the reference's own config store, ref
train.py:72-107 / generate.py:126-129) unless --tag overrides.
"""

from __future__ import annotations

import argparse
import os
import sys


def _tag_from_path(path: str, override: str | None) -> str:
    if override:
        return override
    from msnv_tpu.config import tag_from_checkpoint_path
    return tag_from_checkpoint_path(path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["import", "export"])
    p.add_argument("--torch_ckpt", help="reference checkpoint (import)")
    p.add_argument("--model", help="msnv .npz checkpoint (export)")
    p.add_argument("--tag", default=None,
                   help="experiment tag (default: from the checkpoint's "
                        "results/<tag>/checkpoints/ path)")
    p.add_argument("--out", default=None)
    p.add_argument("--unsafe_load", action="store_true",
                   help="allow full-pickle torch.load for pre-weights_only "
                        "checkpoints (runs arbitrary code from the file — "
                        "only for checkpoints you trust)")
    args = p.parse_args(argv)

    import jax
    from msnv_tpu.config import parse_tag
    from msnv_tpu.interop import (params_from_reference_state_dict,
                                  reference_state_dict_from_params)
    from msnv_tpu.models.samplernn import init_params
    from msnv_tpu.training.checkpoint import load_any, save_checkpoint

    if args.mode == "import":
        if not args.torch_ckpt:
            p.error("import needs --torch_ckpt")
        import torch
        if args.unsafe_load:
            # pre-weights_only-era files (e.g. torch 0.4 saves) need the
            # full unpickler; the flag is explicit consent
            sd = torch.load(args.torch_ckpt, map_location="cpu",
                            weights_only=False)
        else:
            sd = torch.load(args.torch_ckpt, map_location="cpu",
                            weights_only=True)
        tag = _tag_from_path(args.torch_ckpt, args.tag)
        cfg = parse_tag(tag)
        params = params_from_reference_state_dict(sd, cfg.model)
        out = args.out or args.torch_ckpt + ".npz"
        save_checkpoint(out, {"params": params},
                        meta={"tag": tag,
                              "imported_from": os.path.abspath(
                                  args.torch_ckpt)})
        print(f"imported {len(sd)} reference tensors -> {out} (tag {tag})")
    else:
        if not args.model:
            p.error("export needs --model")
        import torch
        tag = _tag_from_path(args.model, args.tag)
        cfg = parse_tag(tag)
        template = init_params(jax.random.PRNGKey(0), cfg.model)
        state, _meta = load_any(args.model, {"params": template})
        sd = reference_state_dict_from_params(state["params"], cfg.model)
        out = args.out or os.path.splitext(args.model)[0] + ".pt"
        # .copy(): jax-backed numpy views are read-only, torch warns
        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                   out)
        print(f"exported {len(sd)} tensors -> {out} (reference "
              f"state_dict, tag {tag})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
