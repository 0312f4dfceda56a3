"""HTTP serving front-end (msnv_tpu/serving.py): healthz, full-WAV
synthesis, chunked streaming, error paths — over a real socket."""

import http.client
import io
import json
import threading

import numpy as np
import pytest

import jax

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.samplernn import init_params
from msnv_tpu.serving import VocoderService, make_server

CFG = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=24, cond_dim=5,
                  spk_dim=3)


@pytest.fixture(scope="module")
def server():
    params = init_params(jax.random.PRNGKey(0), CFG)
    service = VocoderService(params, CFG, frame_bucket=4, name="test")
    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _conn(addr):
    return http.client.HTTPConnection(*addr, timeout=300)


def _post(addr, path, body):
    c = _conn(addr)
    c.request("POST", path, json.dumps(body),
              {"Content-Type": "application/json"})
    return c.getresponse()


def _cond(frames, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(frames, CFG.effective_cond_dim).tolist()


def test_healthz(server):
    c = _conn(server)
    c.request("GET", "/healthz")
    r = c.getresponse()
    assert r.status == 200
    h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["spk_dim"] == 3
    assert h["samples_per_frame"] == CFG.lookback


def test_synthesize_returns_wav(server):
    from msnv_tpu.data.wavio import read_wav
    frames = 6   # not a bucket multiple: exercises pad + trim
    r = _post(server, "/synthesize",
              {"cond": _cond(frames), "spk": 1, "seed": 3})
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    wav = r.read()
    # parse via the library reader (needs a path-like -> use BytesIO shim)
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        f.write(wav)
        path = f.name
    try:
        audio, sr = read_wav(path)
    finally:
        os.unlink(path)
    assert sr == 16000
    assert audio.shape[0] == frames * CFG.lookback   # padding trimmed
    assert np.abs(audio).max() <= 1.0


def test_synthesize_speaker_mix_and_temperature(server):
    r = _post(server, "/synthesize",
              {"cond": _cond(4), "spk": [0.5, 0.5, 0.0],
               "temperature": 0.7})
    assert r.status == 200
    assert len(r.read()) > 44


def test_stream_chunked_matches_frame_count(server):
    frames = 5
    r = _post(server, "/stream", {"cond": _cond(frames), "spk": 0})
    assert r.status == 200
    assert r.getheader("Content-Type").startswith("audio/L16")
    pcm = r.read()   # http.client reassembles chunked bodies
    assert len(pcm) == frames * CFG.lookback * 2   # PCM16
    audio = np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0
    assert np.isfinite(audio).all()


def test_stream_deterministic_same_seed(server):
    body = {"cond": _cond(3), "spk": 2, "seed": 9}
    a = _post(server, "/stream", body).read()
    b = _post(server, "/stream", body).read()
    assert a == b


def test_error_paths(server):
    # wrong cond width
    r = _post(server, "/synthesize", {"cond": [[0.0] * 3], "spk": 0})
    assert r.status == 400
    assert "cond" in json.loads(r.read())["error"]
    # spk out of range
    r = _post(server, "/synthesize", {"cond": _cond(2), "spk": 99})
    assert r.status == 400
    # malformed JSON
    c = _conn(server)
    c.request("POST", "/synthesize", "{not json",
              {"Content-Type": "application/json"})
    assert c.getresponse().status == 400
    # unknown path
    c = _conn(server)
    c.request("GET", "/nope")
    assert c.getresponse().status == 404


def test_wav_bytes_roundtrip(tmp_path):
    """wav_bytes == write_wav file contents (the refactor is behavioral
    identity)."""
    from msnv_tpu.data.wavio import wav_bytes, write_wav
    x = np.sin(np.linspace(0, 20, 400)).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(str(p), x, 16000)
    assert p.read_bytes() == wav_bytes(x, 16000)
    assert p.read_bytes() != wav_bytes(x, 16000, dtype="float32")


def test_batcher_coalesces_concurrent_requests():
    """max_batch>1: N concurrent same-shape requests run as FEWER device
    calls; every caller gets its own correctly-sized audio."""
    from msnv_tpu.serving import VocoderService

    params = init_params(jax.random.PRNGKey(1), CFG)
    service = VocoderService(params, CFG, frame_bucket=4,
                             max_batch=4, linger_ms=150)
    # warm the compile so the linger window isn't eaten by tracing
    service.synthesize({"cond": _cond(4), "spk": 0})

    results = {}
    def call(i):
        wav = service.synthesize({"cond": _cond(4, seed=i), "spk": i % 3,
                                  "seed": i})
        results[i] = wav
    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 6
    assert all(len(w) > 44 for w in results.values())
    sizes = service._batcher.batch_sizes
    assert sum(sizes) == 7   # 1 warmup + 6 concurrent
    assert max(sizes) > 1, sizes   # at least one call actually batched


def test_batcher_error_propagates_to_all_waiters():
    from msnv_tpu.serving import _Batcher

    def boom(gkey, items):
        raise RuntimeError("device on fire")

    b = _Batcher(boom, max_batch=2, linger_s=0.2)
    errs = []
    def call():
        try:
            b.submit("g", {})
        except RuntimeError as e:
            errs.append(str(e))
    threads = [threading.Thread(target=call) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert errs == ["device on fire"] * 2


def test_batcher_overflow_starts_new_group():
    """More submitters than max_batch: the overflow request forms a new
    group with its own leader (nobody deadlocks)."""
    from msnv_tpu.serving import _Batcher

    calls = []
    def run(gkey, items):
        calls.append(len(items))
        return [i for i, _ in enumerate(items)]

    b = _Batcher(run, max_batch=2, linger_s=0.25)
    outs = []
    threads = [threading.Thread(target=lambda: outs.append(b.submit("g", {})))
               for _ in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(outs) == 5
    assert sum(calls) == 5
    assert all(c <= 2 for c in calls)


def test_stream_invalid_request_returns_400(server):
    """Validation must fail BEFORE the 200/chunked headers go out."""
    r = _post(server, "/stream", {"cond": [[0.0, 0.0]], "spk": 0})
    assert r.status == 400
    assert "cond" in json.loads(r.read())["error"]


def test_responses_are_http11(server):
    c = _conn(server)
    c.request("GET", "/healthz")
    r = c.getresponse()
    assert r.version == 11
    h = json.loads(r.read())
    assert h["frames_per_push"] == 1 and h["max_batch"] == 1


def test_stream_tail_completes_with_multiframe_push():
    """frames_per_push=2, 5 frames: the odd tail frame is synthesized via
    1-frame pushes, and the result is sample-exact vs a K=1 server."""
    from msnv_tpu.serving import VocoderService
    params = init_params(jax.random.PRNGKey(3), CFG)
    body = {"cond": _cond(5, seed=4), "spk": 1, "seed": 6}
    s2 = VocoderService(params, CFG, frames_per_push=2)
    skt1 = VocoderService(params, CFG, frames_per_push=1)
    pcm_k2 = b"".join(s2.stream(dict(body)))
    pcm_k1 = b"".join(skt1.stream(dict(body)))
    assert len(pcm_k2) == 5 * CFG.lookback * 2
    assert pcm_k2 == pcm_k1


def test_callable_cache_is_bounded():
    from msnv_tpu.serving import VocoderService
    params = init_params(jax.random.PRNGKey(0), CFG)
    service = VocoderService(params, CFG, frame_bucket=4)
    for i in range(service.MAX_CACHED_CALLABLES + 3):
        service.synthesize({"cond": _cond(4), "spk": 0,
                            "temperature": 0.5 + 0.01 * i})
    assert len(service._gen_cache) <= service.MAX_CACHED_CALLABLES


def test_warm_precompiles_lane_buckets():
    from msnv_tpu.serving import VocoderService
    params = init_params(jax.random.PRNGKey(0), CFG)
    svc = VocoderService(params, CFG, frame_bucket=4, max_batch=4,
                         linger_ms=5)
    svc.warm(frames=6)
    # buckets 1, 2, 4 each ran one device call
    assert svc._batcher.batch_sizes == []  # warm bypasses the batcher
    # a subsequent batched burst reuses the compiled graphs and succeeds
    outs = []
    ts = [threading.Thread(target=lambda i=i: outs.append(
            svc.synthesize({"cond": _cond(6, seed=i), "spk": i % 3})))
          for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert len(outs) == 4


def test_artifact_backed_synthesize(tmp_path_factory):
    """A server holding an AOT artifact (msnv_tpu/export.py) serves
    /synthesize from the exported executable — byte-identical WAV to the
    live-jit server for a bucket-matching request — and falls back to
    live jit for off-bucket shapes."""
    import os
    from msnv_tpu.export import load_artifact, save_artifact

    params = init_params(jax.random.PRNGKey(0), CFG)
    frames = 8                       # = 2 buckets of frame_bucket=4
    art_path = os.path.join(tmp_path_factory.mktemp("art"), "t.msnvx")
    save_artifact(art_path, CFG, [(1, frames)], params=params)
    artifact = load_artifact(art_path)

    def run(service):
        srv = make_server(service, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            body = {"cond": _cond(frames, seed=5), "spk": 2, "seed": 9}
            r = _post(srv.server_address, "/synthesize", body)
            assert r.status == 200
            wav = r.read()
            # off-bucket (frames=4): artifact server must still answer
            r2 = _post(srv.server_address, "/synthesize",
                       {"cond": _cond(4, seed=5), "spk": 2, "seed": 9})
            assert r2.status == 200
            return wav
        finally:
            srv.shutdown()

    with_art = run(VocoderService(params, CFG, frame_bucket=4,
                                  artifact=artifact, name="art"))
    live = run(VocoderService(params, CFG, frame_bucket=4, name="live"))
    assert with_art == live


def test_artifact_mismatch_rejected_at_startup(tmp_path_factory):
    """An artifact exported from a different architecture (or platform)
    must fail at service construction, not per request."""
    import dataclasses
    import os
    from msnv_tpu.export import load_artifact, save_artifact

    params = init_params(jax.random.PRNGKey(0), CFG)
    art_path = os.path.join(tmp_path_factory.mktemp("art2"), "m.msnvx")
    save_artifact(art_path, CFG, [(1, 4)], params=params)
    art = load_artifact(art_path)

    other = dataclasses.replace(CFG, ulaw=not CFG.ulaw)
    with pytest.raises(ValueError, match="mismatch on \\['ulaw'\\]"):
        VocoderService(params, other, artifact=art)

    art.manifest["platforms"] = ["nonexistent-backend"]
    with pytest.raises(ValueError, match="platforms"):
        VocoderService(params, CFG, artifact=art)

    # engine-choice config fields are numerics-equivalent and not part of
    # the artifact ABI: they must NOT fail validation (parse_tag on the
    # serving side always yields the defaults)
    art.manifest["platforms"] = [jax.default_backend()]
    art.manifest["model"]["gru_impl"] = "pallas"
    art.manifest["model"]["mlp_grad_impl"] = "direct"
    VocoderService(params, CFG, artifact=art)   # no raise

    # cuda/rocm exports are valid on hosts whose backend reports 'gpu'
    orig = jax.default_backend
    jax.default_backend = lambda: "gpu"
    try:
        art.manifest["platforms"] = ["cuda"]
        VocoderService(params, CFG, artifact=art)   # no raise
        art.manifest["platforms"] = ["tpu"]
        with pytest.raises(ValueError, match="platforms"):
            VocoderService(params, CFG, artifact=art)
    finally:
        jax.default_backend = orig


def test_service_rejects_degenerate_buckets():
    params = init_params(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError, match="frame_bucket"):
        VocoderService(params, CFG, frame_bucket=0)
    with pytest.raises(ValueError, match="frames_per_push"):
        VocoderService(params, CFG, frames_per_push=0)


def test_artifact_backed_stream(tmp_path_factory):
    """A server holding stream-bucket exports serves /stream from the
    AOT executables — byte-identical PCM to the live-jit server — and
    never touches the live streaming jit cache (the cold-start path:
    first audio right after artifact load, no tracing)."""
    import os
    from msnv_tpu.export import load_artifact, save_artifact

    params = init_params(jax.random.PRNGKey(0), CFG)
    art_path = os.path.join(tmp_path_factory.mktemp("sart"), "s.msnvx")
    # both the server's frames_per_push (2) and the 1-frame tail bucket
    save_artifact(art_path, CFG, [], params=params,
                  stream_buckets=[(1, 1), (1, 2)])
    artifact = load_artifact(art_path)

    def run(service):
        srv = make_server(service, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            # 5 frames = two 2-pushes + a 1-frame tail
            r = _post(srv.server_address, "/stream",
                      {"cond": _cond(5, seed=8), "spk": 1, "seed": 4})
            assert r.status == 200
            return r.read()
        finally:
            srv.shutdown()

    svc_art = VocoderService(params, CFG, frames_per_push=2,
                             artifact=artifact, name="art")
    pcm_art = run(svc_art)
    assert svc_art._stream_cache == {}, (
        "artifact-backed /stream must not populate the live jit cache")
    svc_live = VocoderService(params, CFG, frames_per_push=2, name="live")
    pcm_live = run(svc_live)
    assert svc_live._stream_cache != {}
    assert pcm_art == pcm_live
    assert len(pcm_art) == 5 * CFG.lookback * 2   # PCM16


def test_body_size_cap_413():
    """Oversized request bodies are rejected by Content-Length before
    being read (413), and the connection is closed."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    service = VocoderService(params, CFG, name="cap")
    srv = make_server(service, port=0, max_body=1024)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = _conn(srv.server_address)
        # claim a huge body but only send a little: the cap must fire on
        # the declared length, without waiting for the payload
        c.putrequest("POST", "/synthesize")
        c.putheader("Content-Type", "application/json")
        c.putheader("Content-Length", str(10 << 20))
        c.endheaders()
        c.send(b"{")
        r = c.getresponse()
        assert r.status == 413
        assert "exceeds cap" in json.loads(r.read())["error"]
        assert r.getheader("Connection") == "close"
        # a normal-size request on a fresh connection still works
        r2 = _post(srv.server_address, "/synthesize",
                   {"cond": _cond(4), "spk": 0})
        assert r2.status == 200
    finally:
        srv.shutdown()


def test_stream_cap_429_and_slot_release():
    """Beyond max_streams concurrent streams -> Overloaded/429; closing a
    stream releases its slot; parse errors never consume slots."""
    from msnv_tpu.serving import Overloaded

    params = init_params(jax.random.PRNGKey(0), CFG)
    svc = VocoderService(params, CFG, max_streams=1, name="caps")
    body = {"cond": _cond(3), "spk": 0}
    g1 = svc.stream(body)
    next(g1)                      # stream active, slot held
    with pytest.raises(Overloaded):
        svc.stream(body)
    # bad requests while saturated still raise their 400-class error,
    # not Overloaded, and don't leak slots
    with pytest.raises(ValueError):
        svc.stream({"cond": [[0.0]], "spk": 0})
    g1.close()                    # client disconnect path
    g2 = svc.stream(body)         # slot released
    assert next(g2)
    g2.close()

    # HTTP mapping: a saturated server answers 429
    svc0 = VocoderService(params, CFG, max_streams=0, name="none")
    srv = make_server(svc0, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        r = _post(srv.server_address, "/stream", body)
        assert r.status == 429
        assert "concurrent streams" in json.loads(r.read())["error"]
    finally:
        srv.shutdown()


def test_read_timeout_drops_stalled_connection():
    """A connection that stalls mid-request is dropped after timeout_s
    instead of pinning its handler thread forever."""
    import socket
    import time

    params = init_params(jax.random.PRNGKey(0), CFG)
    service = VocoderService(params, CFG, name="to")
    srv = make_server(service, port=0, timeout_s=0.5)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = _conn(srv.server_address)
        c.putrequest("POST", "/synthesize")
        c.putheader("Content-Type", "application/json")
        c.putheader("Content-Length", "100")
        c.endheaders()            # ...and never send the body
        t0 = time.monotonic()
        with pytest.raises((http.client.BadStatusLine, ConnectionError,
                            socket.timeout)):
            c.getresponse()
            raise ConnectionError("server kept the stalled socket open")
        assert time.monotonic() - t0 < 30
    finally:
        srv.shutdown()


def test_b64_cond_payload_matches_json():
    """'cond' as base64 little-endian f32 parses to the same array as the
    JSON float-list form (and bad payloads 400 cleanly)."""
    import base64

    params = init_params(jax.random.PRNGKey(0), CFG)
    svc = VocoderService(params, CFG, name="b64")
    rng = np.random.RandomState(5)
    cond = rng.rand(7, CFG.effective_cond_dim).astype(np.float32)
    b64 = base64.b64encode(cond.tobytes()).decode()
    cj, sj, tj, _ = svc._parse({"cond": cond.tolist(), "spk": 1})
    cb, sb, tb, _ = svc._parse({"cond": b64, "spk": 1})
    np.testing.assert_array_equal(np.asarray(cj), np.asarray(cb))
    with pytest.raises(ValueError, match="base64"):
        svc._parse({"cond": "!!!not-base64!!!", "spk": 0})
    with pytest.raises(ValueError, match="whole number"):
        svc._parse({"cond": base64.b64encode(b"\x00" * 6).decode(),
                    "spk": 0})
    # end-to-end: /synthesize with a b64 body returns identical audio to
    # the JSON body (same seed/shape -> same program and key)
    import json as _json
    import threading
    import http.client
    srv = make_server(svc, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        outs = []
        for field in (cond.tolist(), b64):
            c = http.client.HTTPConnection(*srv.server_address, timeout=60)
            c.request("POST", "/synthesize",
                      _json.dumps({"cond": field, "spk": 1, "seed": 3}),
                      {"Content-Type": "application/json"})
            r = c.getresponse()
            assert r.status == 200
            outs.append(r.read())
            c.close()
        assert outs[0] == outs[1]
    finally:
        srv.shutdown()
