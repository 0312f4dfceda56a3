"""`msnv-serve` CLI: serve a checkpoint over HTTP."""

from __future__ import annotations


def main(argv=None):
    """CLI: serve a checkpoint.

    python -m msnv_tpu.serving --model results/<tag>/checkpoints/ep...npz \
        [--host 0.0.0.0] [--port 8000] [--temperature 1.0]
    """
    import argparse
    import jax
    from msnv_tpu.config import parse_tag
    from msnv_tpu.models.samplernn import init_params
    from msnv_tpu.training.checkpoint import load_any
    from msnv_tpu.utils.profiling import enable_compile_cache
    import os

    from msnv_tpu.serving.httpd import make_server
    from msnv_tpu.serving.service import VocoderService

    enable_compile_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--frames_per_push", type=int, default=1)
    p.add_argument("--max_batch", type=int, default=1,
                   help=">1: dynamically batch concurrent /synthesize "
                        "requests into one device call")
    p.add_argument("--linger_ms", type=float, default=10.0,
                   help="max wait for co-batchable requests")
    p.add_argument("--max_streams", type=int, default=8,
                   help="concurrent /stream cap (excess gets 429)")
    p.add_argument("--mux_lanes", type=int, default=0,
                   help=">0: lane-batched /stream multiplexer — N "
                        "concurrent default-temperature streams share one "
                        "device carry and advance together per push "
                        "(aggregate throughput at the batched-generation "
                        "rate; per-request seed is ignored on this path)")
    p.add_argument("--mesh_data", type=int, default=0,
                   help=">1: shard /synthesize request lanes over a "
                        "('data','model') device mesh of this many data "
                        "shards (multi-chip serving; params replicate, "
                        "each chip generates its lane shard with a "
                        "per-shard folded key). 0/1 = single device.")
    p.add_argument("--frontend", choices=("aio", "threaded"),
                   default="aio",
                   help="HTTP front-end: 'aio' (selector-based, one "
                        "event-loop thread serves all /stream "
                        "connections — the many-stream default) or "
                        "'threaded' (stdlib thread-per-connection)")
    p.add_argument("--timeout_s", type=float, default=60.0,
                   help="per-connection socket read/write timeout")
    p.add_argument("--max_body_mb", type=float, default=64.0,
                   help="request body size cap (413 beyond it)")
    p.add_argument("--artifact", default=None,
                   help="AOT generation artifact from msnv-export: "
                        "matching requests run the exported executable "
                        "(no tracing); others fall back to live jit. "
                        "Validated against the served model at startup.")
    p.add_argument("--frame_bucket", type=int, default=16,
                   help="pad request frame counts to this multiple "
                        "(bounds compile count; must match msnv-export "
                        "--frame_bucket for artifact dispatch)")
    args = p.parse_args(argv)

    tag = os.path.basename(os.path.dirname(os.path.dirname(
        os.path.abspath(args.model))))
    cfg = parse_tag(tag)
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    state, _ = load_any(args.model, {"params": params})
    artifact = None
    if args.artifact:
        from msnv_tpu.export import load_artifact
        artifact = load_artifact(args.artifact)
    mesh = None
    if args.mesh_data > 1:
        from msnv_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_data=args.mesh_data)
    service = VocoderService(state["params"], cfg.model, mesh=mesh,
                             temperature_default=args.temperature,
                             frame_bucket=args.frame_bucket,
                             frames_per_push=args.frames_per_push,
                             max_batch=args.max_batch,
                             linger_ms=args.linger_ms,
                             max_streams=args.max_streams,
                             name=tag, artifact=artifact,
                             mux_lanes=args.mux_lanes)
    max_body = int(args.max_body_mb * (1 << 20))
    if args.frontend == "aio":
        from msnv_tpu.serving.aio import make_async_server
        server = make_async_server(service, args.host, args.port,
                                   timeout_s=args.timeout_s,
                                   max_body=max_body)
        server.start()
        print(f"serving {tag} on http://{args.host}:"
              f"{server.server_address[1]} (aio front-end)")
        try:
            server._thread.join()
        except KeyboardInterrupt:
            server.shutdown()
    else:
        server = make_server(service, args.host, args.port,
                             timeout_s=args.timeout_s,
                             max_body=max_body)
        print(f"serving {tag} on http://{args.host}:"
              f"{server.server_address[1]}")
        server.serve_forever()


if __name__ == "__main__":
    main()
