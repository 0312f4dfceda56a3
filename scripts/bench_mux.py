#!/usr/bin/env python
"""Concurrent-stream serving benchmark: N simultaneous HTTP /stream
clients through the lane-batched multiplexer (serving.StreamMultiplexer).

Each client requests --seconds of audio; per-stream RTF = audio_s /
client wall. The multiplexer advances all lanes per device push, so
per-stream RTF should stay ~flat with N (the per-connection path's
falls as 1/N past the device budget).

Usage: python scripts/bench_mux.py [--streams 32] [--seconds 2]
       [--frames_per_push 4] [--lanes 64] [--tiny]
Prints one JSON line; recorded in docs/VALIDATION.md.
"""

import argparse
import asyncio
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def direct_mux_bench(args, m, params):
    """N concurrent streams through StreamMultiplexer WITHOUT HTTP: each
    client thread acquires a lane, feeds its cond blocks, and drains its
    out-queue. Measures the serving engine's envelope; the gap to the
    default HTTP mode is the stdlib front-end + colocated-client cost."""
    import jax
    from msnv_tpu.serving import StreamMultiplexer

    mux = StreamMultiplexer(params, m, lanes=args.lanes,
                            frames_per_push=args.frames_per_push)
    mux.start()
    rng = np.random.RandomState(0)
    frames = max(int(args.seconds * 16000) // m.lookback,
                 args.frames_per_push)
    frames -= frames % args.frames_per_push
    cond = rng.rand(frames, m.effective_cond_dim).astype(np.float32)
    blocks = [cond[i:i + args.frames_per_push]
              for i in range(0, frames, args.frames_per_push)]

    def client(i, out):
        try:
            t0 = time.perf_counter()
            lane = mux.acquire(np.asarray([i % m.spk_dim], np.int32))
            mux.feed(lane, blocks)
            q = mux.out_queue(lane)
            total = 0
            for _ in range(len(blocks)):
                total += len(q.get(timeout=600))
            mux.release(lane)
            out[i] = (time.perf_counter() - t0, total)
        except Exception as e:   # noqa: BLE001 — reported below
            out[i] = e

    warm = {}
    client(0, warm)
    assert warm[0][1] == frames * m.lookback, warm
    out = {}
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i, out))
               for i in range(args.streams)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    wall = time.perf_counter() - t0
    errors = {i: repr(v) for i, v in out.items()
              if not isinstance(v, tuple)}
    assert not errors, f"{len(errors)} failed streams: {errors}"
    assert len(out) == args.streams
    audio_s = frames * m.lookback / 16000.0
    rtfs = np.asarray([audio_s / v[0] for v in out.values()])
    print(json.dumps({
        "bench": "mux_direct_engine",
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "streams": args.streams,
        "lanes": args.lanes,
        "frames_per_push": args.frames_per_push,
        "audio_s_per_request": round(audio_s, 2),
        "per_stream_rtf_mean": round(float(rtfs.mean()), 2),
        "per_stream_rtf_min": round(float(rtfs.min()), 2),
        "streams_realtime": int((rtfs >= 1.0).sum()),
        "aggregate_audio_s_per_s": round(float(
            args.streams * audio_s / wall), 1),
    }))
    mux.stop()


async def _aio_clients(addr, body: bytes, n_streams: int,
                       first_bytes: int):
    """Single-threaded async load generator: N concurrent /stream
    clients in one event loop (the wrk-style measurement — client-side
    thread scheduling must not be what the server bench measures).
    Returns {i: (t_first_s, t_total_s, bytes) | Exception} — a failed
    client is RECORDED, not propagated, so one reset cannot cancel the
    other N-1 clients and kill the whole bench (the assert below then
    reports which streams failed, same as the threaded client path)."""
    req = (f"POST /stream HTTP/1.1\r\nHost: bench\r\n"
           f"Content-Type: application/json\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode() + body

    async def one(i, out):
        try:
            await _one(i, out)
        except Exception as e:   # noqa: BLE001 — reported by the caller
            out[i] = e

    async def _one(i, out):
        reader, writer = await asyncio.open_connection(*addr)
        try:
            t0 = time.perf_counter()
            while True:       # 429 = all lanes busy; back off and retry
                writer.write(req)
                await writer.drain()
                line = await reader.readline()
                status = int(line.split()[1])
                headers = {}
                while True:
                    h = await reader.readline()
                    if h in (b"\r\n", b""):
                        break
                    k, _, v = h.decode("latin1").partition(":")
                    headers[k.strip().lower()] = v.strip()
                if status != 429:
                    break
                clen = int(headers.get("content-length", 0))
                if clen:
                    await reader.readexactly(clen)
                await asyncio.sleep(0.05)
            assert status == 200, status
            total, t_first = 0, None
            while True:
                size = int((await reader.readline()).strip(), 16)
                if size == 0:
                    await reader.readline()      # trailing CRLF
                    break
                await reader.readexactly(size + 2)
                total += size
                if t_first is None and total >= first_bytes:
                    t_first = time.perf_counter() - t0
            out[i] = (t_first, time.perf_counter() - t0, total)
        finally:
            writer.close()

    out = {}
    await asyncio.gather(*(one(i, out) for i in range(n_streams)))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=32)
    p.add_argument("--lanes", type=int, default=64)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--frames_per_push", type=int, default=4)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--json_cond", action="store_true",
                   help="send conditioners as JSON float lists instead "
                        "of the base64-f32 fast path")
    p.add_argument("--frontend", choices=("aio", "threaded"),
                   default="aio",
                   help="server front-end: selector-based asyncio "
                        "(default; the many-stream production path) or "
                        "the stdlib thread-per-connection server")
    p.add_argument("--client", choices=("aio", "threads"), default="aio",
                   help="load generator: one async event loop (default) "
                        "or one OS thread per client (the pre-round-5 "
                        "mode; on a 2-vCPU host the client threads "
                        "themselves depress measured RTF)")
    p.add_argument("--direct", action="store_true",
                   help="drive StreamMultiplexer directly (no HTTP): "
                        "measures the serving ENGINE; the delta vs the "
                        "default HTTP mode is the front-end + client "
                        "cost (docs/DESIGN.md 'Serving host ceiling')")
    args = p.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        from msnv_tpu.utils.profiling import enable_compile_cache
        enable_compile_cache(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    from msnv_tpu.config import preset
    from msnv_tpu.models.samplernn import init_params
    from msnv_tpu.serving import VocoderService, make_server

    cfg = preset("tiny_unconditional" if args.tiny else "samplernn")
    m = cfg.model
    params = init_params(jax.random.PRNGKey(0), m)
    if args.direct:
        return direct_mux_bench(args, m, params)
    service = VocoderService(params, m,
                             frames_per_push=args.frames_per_push,
                             mux_lanes=args.lanes, name="bench-mux")
    if args.frontend == "aio":
        from msnv_tpu.serving import make_async_server
        srv = make_async_server(service, port=0)
        srv.start()
    else:
        srv = make_server(service, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    addr = srv.server_address

    frames = max(int(args.seconds * 16000) // m.lookback,
                 args.frames_per_push)
    rng = np.random.RandomState(0)
    cond_arr = rng.rand(frames, m.effective_cond_dim).astype(np.float32)
    if args.json_cond:
        cond_field = cond_arr.tolist()
    else:
        import base64
        cond_field = base64.b64encode(cond_arr.tobytes()).decode()
    body = json.dumps({"cond": cond_field, "spk": 0})

    def one_request(i, out):
        try:
            _one_request(i, out)
        except Exception as e:   # noqa: BLE001 — recorded, reported below
            out[i] = e

    def _one_request(i, out):
        c = http.client.HTTPConnection(*addr, timeout=600)
        t0 = time.perf_counter()
        while True:       # 429 = all lanes busy; back off and retry
            c.request("POST", "/stream", body,
                      {"Content-Type": "application/json"})
            r = c.getresponse()
            if r.status != 429:
                break
            r.read()
            time.sleep(0.05)
        assert r.status == 200, r.status
        first = r.read(2 * m.lookback * args.frames_per_push)
        t_first = time.perf_counter() - t0
        total = len(first)
        while True:
            chunk = r.read(1 << 16)
            if not chunk:
                break
            total += len(chunk)
        out[i] = (t_first, time.perf_counter() - t0, total)
        c.close()

    expect = frames * m.lookback * 2
    first_bytes = 2 * m.lookback * args.frames_per_push
    if args.client == "aio":
        # warm: compile the masked push + fill caches
        warm = asyncio.run(_aio_clients(addr, body.encode(), 1,
                                        first_bytes))
        assert isinstance(warm[0], tuple) and warm[0][2] == expect, warm
        t0 = time.perf_counter()
        out = asyncio.run(_aio_clients(addr, body.encode(), args.streams,
                                       first_bytes))
        wall = time.perf_counter() - t0
    else:
        # warm: compile the masked push + fill caches
        warm = {}
        one_request(-1, warm)
        assert warm[-1][2] == expect, warm

        out = {}
        t0 = time.perf_counter()
        threads = [threading.Thread(target=one_request, args=(i, out))
                   for i in range(args.streams)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        wall = time.perf_counter() - t0

    audio_s = frames * m.lookback / 16000.0
    errors = {i: repr(v) for i, v in out.items()
              if not isinstance(v, tuple)}
    assert not errors, f"{len(errors)} failed streams: {errors}"
    assert len(out) == args.streams, (len(out), args.streams)
    assert all(v[2] == frames * m.lookback * 2 for v in out.values())
    rtfs = np.asarray([audio_s / v[1] for v in out.values()])
    firsts = np.asarray([v[0] for v in out.values()]) * 1e3
    print(json.dumps({
        "bench": "mux_stream_serving",
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "frontend": args.frontend,
        "client": args.client,
        "streams": args.streams,
        "lanes": args.lanes,
        "frames_per_push": args.frames_per_push,
        "audio_s_per_request": round(audio_s, 2),
        "per_stream_rtf_mean": round(float(rtfs.mean()), 2),
        "per_stream_rtf_min": round(float(rtfs.min()), 2),
        "streams_realtime": int((rtfs >= 1.0).sum()),
        "aggregate_audio_s_per_s": round(float(
            args.streams * audio_s / wall), 1),
        "first_audio_ms_p50": round(float(np.percentile(firsts, 50)), 1),
        "first_audio_ms_p95": round(float(np.percentile(firsts, 95)), 1),
    }))
    service.close()
    srv.shutdown()


if __name__ == "__main__":
    main()
