#!/usr/bin/env python
"""Interactive serving benchmark: first-audio latency + per-stream RTF
through a WARM msnv server's /stream endpoint (the reference's only
serving story is one utterance at a time, ref generate.py:154-253).

Measures, over --requests requests of --seconds audio each:
  - time to first audio chunk (HTTP POST -> first chunked PCM bytes),
    p50/p95
  - whole-stream RTF (audio seconds / wall seconds)

Usage (flagship config, random weights — latency does not depend on the
weight values):
  python scripts/bench_interactive.py [--frames_per_push 4] [--seconds 2]
      [--requests 20] [--artifact path.msnvx]
Prints one JSON line; recorded in docs/VALIDATION.md.
"""

import argparse
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames_per_push", type=int, default=4)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--requests", type=int, default=20)
    p.add_argument("--artifact", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny preset on CPU (smoke test of the harness)")
    args = p.parse_args()

    from msnv_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    from msnv_tpu.config import preset
    from msnv_tpu.models.samplernn import init_params
    from msnv_tpu.serving import VocoderService, make_server

    cfg = preset("tiny_unconditional" if args.tiny else "samplernn")
    m = cfg.model
    params = init_params(jax.random.PRNGKey(0), m)
    artifact = None
    if args.artifact:
        from msnv_tpu.export import load_artifact
        artifact = load_artifact(args.artifact)
    service = VocoderService(params, m, frames_per_push=args.frames_per_push,
                             artifact=artifact, name="bench")
    srv = make_server(service, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    addr = srv.server_address

    frames = max(int(args.seconds * 16000) // m.lookback, args.frames_per_push)
    rng = np.random.RandomState(0)
    cond = rng.rand(frames, m.effective_cond_dim).tolist()
    body = json.dumps({"cond": cond, "spk": 0, "seed": 1})

    def one_request(seed):
        c = http.client.HTTPConnection(*addr, timeout=600)
        t0 = time.perf_counter()
        c.request("POST", "/stream", body,
                  {"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 200, r.status
        first = r.read(2 * m.lookback * args.frames_per_push)
        t_first = time.perf_counter() - t0
        total = len(first)
        while True:
            chunk = r.read(1 << 16)
            if not chunk:
                break
            total += len(chunk)
        t_all = time.perf_counter() - t0
        c.close()
        assert total == frames * m.lookback * 2, (total, frames)
        return t_first, t_all

    one_request(0)   # warm: compiles (or artifact load path) + caches
    firsts, totals = [], []
    for i in range(args.requests):
        t_first, t_all = one_request(i + 1)
        firsts.append(t_first)
        totals.append(t_all)

    audio_s = frames * m.lookback / 16000.0
    firsts_ms = np.asarray(firsts) * 1e3
    out = {
        "bench": "interactive_stream_serving",
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "frames_per_push": args.frames_per_push,
        "audio_s_per_request": round(audio_s, 2),
        "requests": args.requests,
        "artifact": bool(artifact),
        "first_audio_ms_p50": round(float(np.percentile(firsts_ms, 50)), 1),
        "first_audio_ms_p95": round(float(np.percentile(firsts_ms, 95)), 1),
        "stream_rtf_mean": round(float(audio_s / np.mean(totals)), 2),
        "stream_rtf_min": round(float(audio_s / np.max(totals)), 2),
    }
    print(json.dumps(out))
    srv.shutdown()


if __name__ == "__main__":
    main()
