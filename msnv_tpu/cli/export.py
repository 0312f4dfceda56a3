"""msnv-export: build an AOT generation artifact from a checkpoint.

Serializes lowered generation executables for a set of (lanes, frames)
buckets into one file (msnv_tpu/export.py) — a deploy artifact that runs
without retracing (and without re-running the model-building Python).
The model architecture is re-hydrated from the experiment tag embedded in
the checkpoint path, the reference's config-store convention
(ref generate.py:126-129).

Usage:
  msnv-export --model results/<tag>/checkpoints/best-ep...npz \
      --out model.msnvx --lanes 1,2,4 --seconds 8 [--engine pallas] \
      [--temperature 0.7] [--spk_mix]
"""

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", required=True,
                   help="checkpoint under results/<tag>/checkpoints/")
    p.add_argument("--out", required=True, help="artifact file to write")
    p.add_argument("--lanes", default="1",
                   help="comma list of lane (batch) bucket sizes")
    p.add_argument("--seconds", type=float, default=None,
                   help="audio seconds per bucket (rounded up to whole "
                        "conditioner frames)")
    p.add_argument("--frames", type=int, default=None,
                   help="conditioner frames per bucket (alternative to "
                        "--seconds)")
    p.add_argument("--frame_bucket", type=int, default=16,
                   help="round frame counts up to this multiple — MUST "
                        "match the server's frame_bucket or its padded "
                        "requests never hit a bucket (msnv-serve default "
                        "16); 1 disables rounding for direct .call users")
    p.add_argument("--engine", default="xla", choices=["xla", "pallas"])
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute inside the executable")
    p.add_argument("--spk_mix", action="store_true",
                   help="float speaker-mixing ABI (eigen-voice) instead "
                        "of int32 speaker ids")
    p.add_argument("--stream", default=None,
                   help="comma list of frames_per_push values to export "
                        "as 1-lane streaming init+push executables (e.g. "
                        "'1,4'); lets msnv-serve --artifact drive /stream "
                        "without live jit — include both the server's "
                        "frames_per_push and 1 (trailing frames)")
    p.add_argument("--platforms", default=None,
                   help="comma list (e.g. tpu,cpu); default: current "
                        "backend")
    args = p.parse_args(argv)

    import jax

    from msnv_tpu.config import parse_tag, tag_from_checkpoint_path
    from msnv_tpu.export import save_artifact
    from msnv_tpu.models.samplernn import init_params
    from msnv_tpu.training.checkpoint import load_any

    if (args.seconds is None) == (args.frames is None):
        p.error("exactly one of --seconds / --frames is required")

    if args.frame_bucket < 1:
        raise SystemExit(f"--frame_bucket must be >= 1 (1 disables "
                         f"rounding), got {args.frame_bucket}")
    tag = tag_from_checkpoint_path(args.model)
    cfg = parse_tag(tag)
    m = cfg.model
    if args.frames is not None:
        n_frames = args.frames
    else:
        n_frames = -(-int(args.seconds * 16000) // m.lookback)
    n_frames = -(-n_frames // args.frame_bucket) * args.frame_bucket
    lanes = [int(x) for x in args.lanes.split(",") if x]
    for b in lanes:
        if b & (b - 1):
            print(f"warning: lanes={b} is not a power of two — "
                  f"msnv-serve pads live batches to powers of two and "
                  f"will never dispatch to this bucket (direct "
                  f"GenerationArtifact.call users are unaffected)",
                  file=sys.stderr)

    params = init_params(jax.random.PRNGKey(0), m)
    state, _meta = load_any(args.model, {"params": params})
    params = state["params"] if "params" in state else state

    stream_buckets = None
    if args.stream:
        stream_buckets = [(1, int(k)) for k in args.stream.split(",") if k]

    import jax.numpy as jnp
    manifest = save_artifact(
        args.out, cfg, [(b, n_frames) for b in lanes],
        temperature=args.temperature,
        use_pallas=args.engine == "pallas",
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        spk_mix=args.spk_mix,
        platforms=args.platforms.split(",") if args.platforms else None,
        params=params, stream_buckets=stream_buckets)
    import json
    import os
    print(json.dumps({"artifact": args.out,
                      "bytes": os.path.getsize(args.out),
                      "tag": manifest["tag"],
                      "engine": manifest["engine"],
                      "platforms": manifest["platforms"],
                      "buckets": manifest["buckets"],
                      "streams": manifest["streams"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
