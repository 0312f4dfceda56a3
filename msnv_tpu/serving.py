"""HTTP serving front-end for the vocoder (stdlib-only, no web framework).

The reference has no serving story — synthesis is the offline generate.py
writing WAV files (ref generate.py:98-112). This exposes a loaded
checkpoint behind a small threaded HTTP server:

  GET  /healthz     -> JSON {status, model, spk_dim, cond_dim, ...}
  POST /synthesize  -> complete WAV (audio/wav)
       JSON body: {"cond": [[...frame vectors (effective_cond_dim)...]],
                   "spk": int | [mix weights], "temperature": 1.0,
                   "seed": 0}
  POST /stream      -> chunked PCM16 (audio/L16;rate=16000): same body;
       audio bytes are flushed per conditioner-frame group as they are
       generated (models/generate.streaming_fn, O(1) server-side state) —
       first audio after ONE frame of conditioners, unbounded length.

Design notes (TPU serving):
- /synthesize jit-compiles per conditioner-frame-count bucket; requests
  are padded up to the next multiple of `frame_bucket` frames (the last
  frame repeats — look-ahead-safe) and the audio is trimmed, so the
  number of distinct XLA programs stays bounded.
- /stream shares ONE compiled push function (batch 1); per-connection
  state is the O(dim) streaming carry. On TPU the push runs the fused
  Pallas window kernel in bf16, and audio fetches are async-pipelined
  (see VocoderService.stream_fetch_depth) — realtime at 20 ms chunks
  through a tunneled device.
- For throughput-oriented many-stream serving, `--mux_lanes N` enables
  the lane-batched StreamMultiplexer: N concurrent /stream requests
  share one device carry and advance together per masked push, putting
  aggregate throughput at the batched-generation rate
  (scripts/bench_mux.py; scripts/serve_demo.py measured the raw
  batched envelope at ~500 realtime streams/chip).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from msnv_tpu.config import ModelConfig
from msnv_tpu.data.wavio import pcm16_bytes, wav_bytes

SAMPLE_RATE = 16000


class Overloaded(Exception):
    """Raised when the concurrent-stream cap is hit (HTTP 429)."""


class _TooLarge(Exception):
    """Request body over the handler's max_body cap (HTTP 413)."""

    def __init__(self, length: int):
        super().__init__(length)
        self.length = length


def _armed(body_gen, cleanup):
    """Return a STARTED generator whose `cleanup` is guaranteed to run
    when it is closed, exhausted, or garbage-collected.

    An unstarted generator's ``finally`` never executes (close() on it
    skips the body), so acquiring a resource before returning a fresh
    generator leaks it permanently if the caller errors before the first
    ``next()`` — e.g. an HTTP handler whose header write fails on a
    disconnected client. Priming past a sentinel yield enters the
    ``try`` block, arming the cleanup for every subsequent outcome
    (CPython refcounting closes an abandoned suspended generator
    immediately)."""
    def run():
        try:
            yield None           # priming sentinel (consumed below)
            yield from body_gen
        finally:
            cleanup()

    g = run()
    next(g)                      # enter try: cleanup is now armed
    return g


class _Batcher:
    """Leader-follower dynamic batching: concurrent requests of the same
    (frames, temperature, speaker-kind) group coalesce into ONE device
    call of up to `max_batch` lanes.

    The first request into a group becomes the leader: it lingers up to
    `linger_s` (or until the group fills), then executes the whole group
    and distributes results; followers just wait on their slot. No
    dedicated worker thread — idle servers cost nothing.
    """

    def __init__(self, run_group, max_batch: int, linger_s: float):
        self._run_group = run_group     # (gkey, [item]) -> [result]
        self.max_batch = int(max_batch)
        self.linger_s = float(linger_s)
        self._groups = {}               # gkey -> {"items": [...], "closed"}
        self._cv = threading.Condition()
        self.batch_sizes = []           # observability (tests/monitoring)

    def submit(self, gkey, item):
        slot = {"ev": threading.Event()}
        with self._cv:
            group = self._groups.get(gkey)
            if group is None or group.get("closed") \
                    or len(group["items"]) >= self.max_batch:
                group = {"items": [], "closed": False}
                self._groups[gkey] = group
            group["items"].append((item, slot))
            leader = len(group["items"]) == 1
            if len(group["items"]) >= self.max_batch:
                if self._groups.get(gkey) is group:
                    del self._groups[gkey]
                self._cv.notify_all()

        if leader:
            # monotonic: a wall-clock step must not stretch/collapse the
            # batching window
            deadline = time.monotonic() + self.linger_s
            with self._cv:
                while (len(group["items"]) < self.max_batch
                       and time.monotonic() < deadline):
                    self._cv.wait(
                        timeout=max(deadline - time.monotonic(), 1e-4))
                group["closed"] = True
                if self._groups.get(gkey) is group:
                    del self._groups[gkey]
                items = list(group["items"])
            self.batch_sizes.append(len(items))
            try:
                results = self._run_group(gkey, [it for it, _ in items])
                for (_, s), r in zip(items, results):
                    s["result"] = r
            except BaseException as e:  # even KeyboardInterrupt/SystemExit
                for _, s in items:      # must release every follower
                    s["error"] = e
            finally:
                for _, s in items:
                    s["ev"].set()

        slot["ev"].wait()
        if "error" in slot:
            raise slot["error"]
        return slot["result"]


class StreamMultiplexer:
    """Lane-batched /stream engine: up to `lanes` concurrent streams share
    ONE device-resident streaming carry and one pump loop.

    The per-connection path pays the full device dispatch + fetch round
    trip PER STREAM (streams serialize on the device lock: per-stream RTF
    ~ 1/N). Here every pump tick advances ALL lanes with pending
    conditioner frames in a single masked K-frame push — the Pallas
    window kernel batches lanes for free — so aggregate throughput is the
    batched-generation rate (hundreds of realtime streams/chip,
    scripts/serve_demo.py) instead of the single-stream rate.

    Mechanics:
    - carry lanes attach/detach dynamically: `_attach` splices a fresh
      (q_zero buffer, learned-h0 hidden, speaker vector) into lane i via
      dynamic_update_slice; `_masked_push` advances the batch and
      keeps inactive lanes' state frozen with jnp.where.
    - the pump fetch-pipelines like the per-connection path: host copies
      start async at dispatch and drain a few ticks behind.
    - PRNG: one key advances per tick for the whole batch (like batched
      generation) — a multiplexed stream gets the same distribution but a
      different sample stream than a solo run, and per-request `seed` is
      ignored. Streams needing seed-exact audio use the per-connection
      path (mux_lanes=0).
    """

    FETCH_DEPTH = 4

    def __init__(self, params, cfg: ModelConfig, lanes: int = 32,
                 frames_per_push: int = 4, temperature: float = 1.0,
                 seed: int = 0):
        import queue as _queue

        import jax
        import jax.numpy as jnp
        from msnv_tpu.models.generate import streaming_fn

        self.cfg = cfg
        self.lanes = int(lanes)
        self.K = int(frames_per_push)
        self.temperature = float(temperature)
        on_tpu = jax.devices()[0].platform == "tpu"
        use_pallas = on_tpu and temperature > 0.0
        init_state, push = streaming_fn(
            params, cfg, frames_per_push=self.K,
            compute_dtype=jnp.bfloat16 if on_tpu else None,
            use_pallas=use_pallas,
            pallas_opts={"v2": True} if use_pallas else None,
            temperature=temperature)

        @jax.jit
        def masked_push(carry, cond, active):
            spk_vec, buf, hs, key = carry
            # streaming push takes (B, C) at K=1 but (B, K, C) at K>1;
            # the pump always builds (lanes, K, C) blocks — normalize
            # (trace-time static, so direct 2-D calls still work)
            if self.K == 1 and cond.ndim == 3:
                cond = cond[:, 0]
            new_carry, audio, _ = push(carry, cond)
            _, buf2, hs2, key2 = new_carry
            buf3 = jnp.where(active[:, None], buf2, buf)
            hs3 = tuple(jnp.where(active[None, :, None], h2, h)
                        for h2, h in zip(hs2, hs))
            return (spk_vec, buf3, hs3, key2), audio

        def attach_fn(carry, lane, spk):
            fresh = init_state(1, spk, jax.random.PRNGKey(0))
            s1, b1, h1, _ = fresh
            spk_vec, buf, hs, key = carry
            zero = jnp.int32(0)
            spk_vec = jax.lax.dynamic_update_slice(
                spk_vec, s1.astype(spk_vec.dtype), (lane, zero))
            buf = jax.lax.dynamic_update_slice(buf, b1, (lane, zero))
            hs = tuple(
                jax.lax.dynamic_update_slice(h, h1i, (zero, lane, zero))
                for h, h1i in zip(hs, h1))
            return (spk_vec, buf, hs, key)

        self._masked_push = masked_push
        self._attach_jit = jax.jit(attach_fn)
        self._carry = init_state(
            self.lanes, jnp.zeros((self.lanes,), jnp.int32),
            jax.random.PRNGKey(seed))
        self._zeros_cond = np.zeros(
            (self.lanes, self.K, cfg.effective_cond_dim), np.float32)
        self._cv = threading.Condition()
        self._free = list(range(self.lanes))
        self._pending = {}     # lane -> list of (K, C) np blocks, FIFO
        self._out = {}         # lane -> queue.Queue of np audio chunks
        self._gen = [0] * self.lanes   # lane reuse epoch: in-flight audio
        #                                of a released stream must never
        #                                reach the lane's NEXT occupant
        self._queue_cls = _queue.Queue
        self._stop = False
        self._thread = None
        self._inflight = []    # [(device audio, [(lane, gen) served])]
        # carry mutations (attach splices vs pump ticks) must be atomic:
        # an attach interleaved inside a pump's read-push-write would be
        # overwritten by the pushed carry. _carry_lock is the outer lock;
        # the device lock (shared with /synthesize) nests inside it.
        self._carry_lock = threading.Lock()
        self._device_lock = threading.Lock()

    # -- connection side --------------------------------------------------

    def acquire(self, spk):
        """Reserve a lane and splice in a fresh stream state; returns the
        lane id. Raises Overloaded when all lanes are busy."""
        import jax.numpy as jnp
        with self._cv:
            if not self._free:
                raise Overloaded(
                    f"all {self.lanes} multiplexer lanes busy")
            lane = self._free.pop()
            self._gen[lane] += 1
            self._pending[lane] = []
            self._out[lane] = self._queue_cls()
        # attach OUTSIDE the cv (device call) but atomically wrt pump
        # ticks; the pump skips lanes with no pending blocks, so the
        # splice itself cannot race a push of this lane's state
        with self._carry_lock, self._device_lock:
            self._carry = self._attach_jit(self._carry, jnp.int32(lane),
                                           jnp.asarray(spk))
        return lane

    def feed(self, lane: int, cond_blocks):
        """Queue (K, C) conditioner blocks for a lane and wake the pump."""
        with self._cv:
            self._pending[lane].extend(cond_blocks)
            self._cv.notify_all()

    def release(self, lane: int) -> None:
        with self._cv:
            self._pending.pop(lane, None)
            self._out.pop(lane, None)
            self._free.append(lane)

    def out_queue(self, lane: int):
        return self._out[lane]

    # -- pump -------------------------------------------------------------

    def start(self, device_lock=None) -> None:
        if device_lock is not None:
            self._device_lock = device_lock
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=10)

    def _drain_one(self):
        audio_dev, served = self._inflight.pop(0)
        audio = np.asarray(audio_dev)
        for lane, gen in served:
            # drop audio of released streams; the gen check stops a
            # recycled lane's new occupant from receiving it
            q = self._out.get(lane)
            if q is not None and self._gen[lane] == gen:
                q.put(audio[lane])

    def _revalidate_served(self, served, active):
        """Drop lanes recycled between their block pop and the push.

        MUST be called under _carry_lock (acquire's attach also holds
        it). A lane released and re-acquired after the pump popped its
        cond block holds the NEW stream's freshly spliced state — a push
        with the OLD stream's conditioners would corrupt that carry
        (_drain_one's gen check only drops the stale audio, not the
        state advance). acquire increments _gen BEFORE attaching, so any
        attach that completed before _carry_lock was taken is visible
        here as a gen change; an attach that has not happened yet leaves
        the OLD state in the lane, where a stale push is harmless
        because the attach will overwrite it."""
        stale = [i for i, (lane, gen) in enumerate(served)
                 if self._gen[lane] != gen]
        for i in reversed(stale):
            lane, _ = served.pop(i)
            active[lane] = False

    def _pump(self):
        import jax.numpy as jnp
        while True:
            with self._cv:
                while not self._stop and not any(self._pending.values()):
                    # nothing to push: finish draining, then sleep
                    if self._inflight:
                        break
                    self._cv.wait(timeout=0.5)
                if self._stop:
                    break
                served, cond = [], None
                if any(self._pending.values()):
                    cond = self._zeros_cond.copy()
                    for lane, blocks in self._pending.items():
                        if blocks:
                            cond[lane] = blocks.pop(0)
                            served.append((lane, self._gen[lane]))
            if cond is None:
                # woke only to drain
                self._drain_one()
                continue
            active = np.zeros((self.lanes,), bool)
            active[[lane for lane, _ in served]] = True
            with self._carry_lock, self._device_lock:
                self._revalidate_served(served, active)
                if not served:
                    continue
                self._carry, audio = self._masked_push(
                    self._carry, jnp.asarray(cond), jnp.asarray(active))
            if hasattr(audio, "copy_to_host_async"):
                audio.copy_to_host_async()
            self._inflight.append((audio, served))
            while len(self._inflight) > self.FETCH_DEPTH:
                self._drain_one()
        while self._inflight:
            self._drain_one()


class VocoderService:
    """Holds the model + compiled generation callables for the server."""

    def __init__(self, params, cfg: ModelConfig, temperature_default=1.0,
                 frame_bucket: int = 16, frames_per_push: int = 1,
                 max_batch: int = 1, linger_ms: float = 10.0,
                 max_streams: int = 8, name: str = "msnv", artifact=None,
                 mux_lanes: int = 0):
        self.params = params
        self.cfg = cfg
        # AOT generation artifact (msnv_tpu/export.py): requests whose
        # (lanes, frames, temperature, spk-kind) hit an exported bucket
        # run the deserialized executable — no tracing on the serving
        # host; everything else falls back to the live jit path
        if artifact is not None:
            self._validate_artifact(artifact, cfg)
        self.artifact = artifact
        self.temperature_default = float(temperature_default)
        self.frame_bucket = int(frame_bucket)
        if self.frame_bucket < 1:
            raise ValueError(
                f"frame_bucket must be >= 1 (1 disables rounding), got "
                f"{frame_bucket}")
        self.frames_per_push = int(frames_per_push)
        if self.frames_per_push < 1:
            raise ValueError(
                f"frames_per_push must be >= 1, got {frames_per_push}")
        self.name = name
        self._gen_cache = {}       # temperature -> generate fn
        self._stream_cache = {}    # T -> (init_state, push)
        self._lock = threading.Lock()  # one device user at a time
        # dynamic batching (max_batch > 1): concurrent /synthesize
        # requests coalesce into one device call. Per-request `seed`
        # reproducibility then holds only for identical batch
        # composition (the per-step PRNG key is shared across lanes).
        self._batcher = (_Batcher(self._run_group, max_batch,
                                  linger_ms / 1000.0)
                         if max_batch > 1 else None)
        # concurrent-stream cap: each open /stream holds device state and
        # an HTTP thread for its whole lifetime — without a cap a client
        # can pin unbounded threads/carries. Excess requests get 429.
        self.max_streams = int(max_streams)
        self._stream_slots = threading.BoundedSemaphore(
            max(self.max_streams, 1))
        # lane-batched /stream multiplexer (mux_lanes > 0): concurrent
        # default-temperature streams share one device carry and advance
        # together per pump tick (see StreamMultiplexer). Non-default
        # temperatures and seed-exact requests use the per-connection
        # path above.
        self._mux = None
        if mux_lanes > 0:
            self._mux = StreamMultiplexer(
                params, cfg, lanes=mux_lanes,
                frames_per_push=max(self.frames_per_push, 1),
                temperature=self.temperature_default)
            self._mux.start(device_lock=self._lock)

    def close(self) -> None:
        """Stop background machinery (the mux pump); idempotent."""
        if self._mux is not None:
            self._mux.stop()

    @staticmethod
    def _validate_artifact(artifact, cfg: ModelConfig) -> None:
        """Fail at STARTUP, not per request: an artifact exported from a
        different architecture would either throw inside exp.call on
        every bucket hit or — worse, for same-shaped configs like
        ulaw:T vs ulaw:F — silently produce wrong audio."""
        import dataclasses
        import jax

        # engine-choice fields are numerics-equivalent (config.py) and do
        # not affect the exported executable (the artifact's engine is the
        # separate manifest "engine" field) — never a compatibility reason
        engine_fields = ("gru_impl", "mlp_grad_impl")

        def norm(d):
            return {k: list(v) if isinstance(v, (list, tuple)) else v
                    for k, v in d.items() if k not in engine_fields}

        want, got = norm(dataclasses.asdict(cfg)), norm(
            dict(artifact.manifest.get("model") or {}))
        if want != got:
            diff = sorted(k for k in set(want) | set(got)
                          if want.get(k) != got.get(k))
            raise ValueError(
                f"artifact/model config mismatch on {diff}: "
                f"artifact {[got.get(k) for k in diff]} vs served model "
                f"{[want.get(k) for k in diff]}")
        backend = jax.default_backend()
        platforms = artifact.manifest.get("platforms") or []
        # jax.default_backend() says 'gpu' for either CUDA or ROCm, while
        # jax.export names the lowering target 'cuda'/'rocm'; narrow by
        # the device kind string where the vendor is identifiable so a
        # ROCm artifact can't pass startup validation on a CUDA host
        # (unidentifiable kinds accept both and fail at first call)
        if backend == "gpu":
            kind = jax.devices()[0].device_kind.lower()
            if "nvidia" in kind or "tesla" in kind:
                accepted = ("gpu", "cuda")
            elif "amd" in kind or "instinct" in kind:
                accepted = ("gpu", "rocm")
            else:
                accepted = ("gpu", "cuda", "rocm")
        else:
            accepted = (backend,)
        if not any(p in platforms for p in accepted):
            want = "cuda" if backend == "gpu" else backend
            raise ValueError(
                f"artifact was exported for platforms {platforms}; this "
                f"server runs on '{backend}' (re-export with "
                f"--platforms {want} or on the serving machine)")

    # -- request plumbing ------------------------------------------------

    def _parse(self, body: dict):
        import jax.numpy as jnp
        cond = np.asarray(body["cond"], np.float32)
        if cond.ndim != 2 or cond.shape[1] != self.cfg.effective_cond_dim:
            raise ValueError(
                f"cond must be (frames, {self.cfg.effective_cond_dim}), "
                f"got {cond.shape}")
        spk = body.get("spk", 0)
        if isinstance(spk, (list, tuple)):
            spk_arr = np.asarray([spk], np.float32)   # embedding mix
            if spk_arr.shape[1] != self.cfg.spk_dim:
                raise ValueError(f"spk mix needs {self.cfg.spk_dim} weights")
        else:
            if not 0 <= int(spk) < self.cfg.spk_dim:
                raise ValueError(f"spk id out of range [0, {self.cfg.spk_dim})")
            spk_arr = np.asarray([int(spk)], np.int32)
        temperature = float(body.get("temperature",
                                     self.temperature_default))
        seed = int(body.get("seed", 0))
        return jnp.asarray(cond), jnp.asarray(spk_arr), temperature, seed

    def healthz(self) -> dict:
        return {"status": "ok", "model": self.name,
                "spk_dim": self.cfg.spk_dim,
                "cond_dim": self.cfg.effective_cond_dim,
                "samples_per_frame": self.cfg.lookback,
                "sample_rate": SAMPLE_RATE,
                "frames_per_push": self.frames_per_push,
                "max_batch": (self._batcher.max_batch
                              if self._batcher else 1),
                "max_streams": self.max_streams,
                "mux_lanes": self._mux.lanes if self._mux else 0,
                "artifact_buckets": (list(self.artifact.buckets)
                                     if self.artifact else None),
                "artifact_streams": (list(self.artifact.stream_buckets)
                                     if self.artifact else None)}

    # -- batch synthesis ---------------------------------------------------

    def synthesize(self, body: dict) -> bytes:
        """Full-utterance synthesis -> WAV bytes."""
        cond, spk, temperature, seed = self._parse(body)
        n = cond.shape[0]
        # pad frames up to a bucket multiple (repeat the last frame) so the
        # compile count is bounded by the number of buckets, not lengths
        padded = -(-n // self.frame_bucket) * self.frame_bucket
        if padded != n:
            import jax.numpy as jnp
            cond = jnp.concatenate(
                [cond, jnp.repeat(cond[-1:], padded - n, axis=0)], axis=0)
        item = {"cond": cond, "spk": spk, "seed": seed, "n": n}
        gkey = (padded, temperature,
                "f" if np.asarray(spk).dtype.kind == "f" else "i")
        if self._batcher is not None:
            audio = self._batcher.submit(gkey, item)
        else:
            audio = self._run_group(gkey, [item])[0]
        return wav_bytes(audio, SAMPLE_RATE)

    def warm(self, frames: int, temperature=None, lanes=None) -> None:
        """Pre-compile the /synthesize executables for a conditioner
        length (rounded up to the frame bucket) and each power-of-two
        lane count up to max_batch — dynamic batching otherwise pays a
        full generation-graph compile the first time a new live batch
        size appears under load."""
        temperature = (self.temperature_default if temperature is None
                       else float(temperature))
        padded = -(-frames // self.frame_bucket) * self.frame_bucket
        if lanes is None:
            mb = self._batcher.max_batch if self._batcher else 1
            lanes, b = [], 1
            while b <= mb:
                lanes.append(b)
                b *= 2
        import jax.numpy as jnp
        cond = jnp.zeros((padded, self.cfg.effective_cond_dim), jnp.float32)
        spk = jnp.zeros((1,), jnp.int32)
        gkey = (padded, temperature, "i")
        for b in lanes:
            items = [{"cond": cond, "spk": spk, "seed": 0, "n": frames}
                     for _ in range(b)]
            self._run_group(gkey, items)

    def _run_group(self, gkey, items) -> list:
        """ONE device call for a group of same-shape requests; returns the
        per-request float audio (trimmed to each request's frames)."""
        import jax
        import jax.numpy as jnp
        from msnv_tpu.models.generate import generate_fn_dynamic
        _padded, temperature, _kind = gkey
        b = len(items)
        # pad lanes to the next power of two so distinct live batch sizes
        # cause at most log2(max_batch) retraces (padded lanes repeat
        # lane 0 and are sliced away)
        lanes = 1 << (b - 1).bit_length()
        conds = jnp.stack([it["cond"] for it in items]
                          + [items[0]["cond"]] * (lanes - b))
        spks = jnp.concatenate([it["spk"] for it in items]
                               + [items[0]["spk"]] * (lanes - b))
        # one key for the whole batch: fold the request seeds together
        key = jax.random.PRNGKey(items[0]["seed"])
        for it in items[1:]:
            key = jax.random.fold_in(key, it["seed"])
        art = self.artifact
        with self._lock:
            if (art is not None
                    and temperature == art.manifest["temperature"]
                    and art.manifest["spk_mix"] == (_kind == "f")
                    and art.has_bucket(lanes, int(conds.shape[1]))):
                audio, _ = art.call(self.params, conds, spks, key)
            else:
                if temperature not in self._gen_cache:
                    self._evict(self._gen_cache)
                    # dynamic form: params are a call argument, so the
                    # executable holds no weight constants (~350 MB ->
                    # ~MBs at flagship size) and can't crowd the
                    # backend's loaded-program arena under many
                    # temperature/bucket combinations
                    self._gen_cache[temperature] = generate_fn_dynamic(
                        self.cfg, temperature=temperature)
                audio, _ = self._gen_cache[temperature](
                    self.params, conds, spks, key)
        audio = np.asarray(audio)
        return [audio[i, :it["n"] * self.cfg.lookback]
                for i, it in enumerate(items)]

    MAX_CACHED_CALLABLES = 8

    def _evict(self, cache: dict) -> None:
        """Bound the compiled-callable caches: entries are dynamic-form
        programs (no weight constants), but each is still a loaded
        executable, and the key is the CLIENT-supplied temperature —
        unbounded growth would let a client bloat the server's program
        arena by sweeping temperature values."""
        while len(cache) >= self.MAX_CACHED_CALLABLES:
            cache.pop(next(iter(cache)))   # oldest-inserted first

    # -- streaming synthesis ----------------------------------------------

    def _stream_push(self, temperature, k, spk_kind="i"):
        """(init_state(batch, spk, key), push(carry, cond)) for K-frame
        pushes. Prefers the artifact's exported streaming executables
        (no tracing on the serving host); falls back to live jit."""
        art = self.artifact
        if (art is not None
                and temperature == art.manifest["temperature"]
                and art.manifest["spk_mix"] == (spk_kind == "f")
                and art.has_stream(1, k)):
            a_init, a_push = art.streaming(k, lanes=1)

            def init_state(batch, spk, key):
                assert batch == 1, "exported stream buckets are 1-lane"
                return a_init(self.params, spk, key)

            def push(carry, cond):
                return a_push(self.params, carry, cond)

            return init_state, push
        import jax
        from msnv_tpu.models.generate import streaming_fn_dynamic
        with self._lock:
            if (temperature, k) not in self._stream_cache:
                self._evict(self._stream_cache)
                # dynamic form (see _run_group): small executables, one
                # compile serves changing weights. On TPU the push uses
                # bf16 matvecs + the Pallas window sampler (one kernel per
                # 20-sample window instead of an 80-step inner scan):
                # B=1 K=1 push 4.4 -> 1.6 ms on-chip, which is what makes
                # /stream realtime at 20 ms chunks. Greedy (T == 0) and
                # non-TPU backends keep the XLA inner scan.
                on_tpu = jax.default_backend() == "tpu"
                use_pallas = on_tpu and temperature > 0.0
                import jax.numpy as jnp
                self._stream_cache[(temperature, k)] = streaming_fn_dynamic(
                    self.cfg, frames_per_push=k, temperature=temperature,
                    compute_dtype=jnp.bfloat16 if on_tpu else None,
                    use_pallas=use_pallas,
                    pallas_opts={"v2": True} if use_pallas else None)
        d_init, d_push = self._stream_cache[(temperature, k)]

        def init_state(batch, spk, key):
            return d_init(self.params, batch, spk, key)

        def push(carry, cond):
            return d_push(self.params, carry, cond)

        return init_state, push

    def stream(self, body: dict):
        """Yield PCM16 chunks as frame groups are generated. Trailing
        frames beyond a multiple of `frames_per_push` finish with 1-frame
        pushes (the carry pytree is compatible across push widths, and a
        K-frame push is sample-exact vs K single pushes).

        Raises Overloaded (HTTP 429) beyond `max_streams` concurrent
        streams; the slot is released when the generator finishes or is
        closed (client disconnect included)."""
        args = self._parse(body)   # 400s must not consume a slot
        cond, spk, temperature, seed = args
        if (self._mux is not None
                and temperature == self._mux.temperature
                and "seed" not in body):
            # seed-less default-temperature streams ride the multiplexer;
            # an explicit seed requests reproducible audio, which the
            # shared-key mux cannot honor — fall through to per-connection
            return self._mux_stream_iter(cond, spk)
        if self.max_streams <= 0 or \
                not self._stream_slots.acquire(blocking=False):
            raise Overloaded(
                f"too many concurrent streams (cap {self.max_streams})")
        # _armed: the slot must be released even if the caller errors
        # before ever iterating the returned generator
        return _armed(self._stream_iter(*args), self._stream_slots.release)

    # fetch-pipeline depth for /stream: chunks in flight between device
    # dispatch and host fetch. A synchronous device->host read costs
    # ~25-30 ms on a tunneled device (vs ~4 ms of device compute per
    # 20 ms chunk) and does NOT overlap queued work; starting the host
    # copy async at dispatch time and draining D chunks behind restores
    # RTF 0.7 -> ~4 at D=8, at the price of D chunks of added stream
    # latency (D*K*5 ms of audio buffered in flight).
    stream_fetch_depth = 8

    def _mux_stream_iter(self, cond, spk):
        """Serve one stream through the lane multiplexer: pad the cond
        track to a K-multiple (repeating the last frame), feed the lane,
        yield PCM16 chunks as its ticks drain, trim the pad."""
        mux = self._mux
        K = mux.K
        cond_np = np.asarray(cond, np.float32)
        n = len(cond_np)
        pad = (-n) % K
        if pad:
            cond_np = np.concatenate(
                [cond_np, np.repeat(cond_np[-1:], pad, axis=0)])
        lane = mux.acquire(spk)          # raises Overloaded when full

        def body():
            blocks = [cond_np[i:i + K]
                      for i in range(0, len(cond_np), K)]
            mux.feed(lane, blocks)
            q = mux.out_queue(lane)
            remaining = n * self.cfg.lookback
            for _ in range(len(blocks)):
                audio = q.get(timeout=120.0)
                take = min(len(audio), remaining)
                remaining -= take
                if take > 0:
                    yield pcm16_bytes(audio[:take])

        # _armed: the lane must be released even if the caller errors
        # before ever iterating the returned generator
        return _armed(body(), lambda: mux.release(lane))

    def _stream_iter(self, cond, spk, temperature, seed):
        import jax
        kind = "f" if np.asarray(spk).dtype.kind == "f" else "i"
        K = self.frames_per_push
        init_state, push = self._stream_push(temperature, K, kind)
        carry = init_state(1, spk, jax.random.PRNGKey(seed))
        n = cond.shape[0]
        # fetch pipeline: dispatch push k and START its host copy, fetch
        # chunk k-D. Dispatch is async; the only blocking step is the
        # drain of a copy that has had D pushes of wall-clock to complete.
        queue = []

        def flush(a):
            return pcm16_bytes(np.asarray(a)[0])

        def enqueue(audio):
            # copy_to_host_async is an optimization, not a requirement —
            # older jax Array impls without it just pay the sync fetch
            if hasattr(audio, "copy_to_host_async"):
                audio.copy_to_host_async()
            queue.append(audio)
            if len(queue) > self.stream_fetch_depth:
                return flush(queue.pop(0))
            return None

        for start in range(0, n - n % K, K):
            block = cond[start:start + K]
            with self._lock:
                carry, audio, _ = push(
                    carry, block[None] if K > 1 else block[None, 0])
            out = enqueue(audio)
            if out is not None:
                yield out
        if n % K:
            # the artifact and live carries are representation-compatible
            # (same pytree, raw uint32 key data), so trailing 1-frame
            # pushes may come from either source
            _, push1 = self._stream_push(temperature, 1, kind)
            for j in range(n - n % K, n):
                with self._lock:
                    carry, audio, _ = push1(carry, cond[None, j])
                out = enqueue(audio)
                if out is not None:
                    yield out
        for audio in queue:
            yield flush(audio)


class _Handler(BaseHTTPRequestHandler):
    service: VocoderService  # set by make_server
    # chunked transfer (used by /stream) does not exist in HTTP/1.0;
    # version-keyed clients would read the hex chunk framing as audio
    protocol_version = "HTTP/1.1"
    # robustness envelope (make_server overrides): a socket read/write
    # blocking past `timeout` seconds kills the connection instead of
    # pinning its thread forever; request bodies above max_body get 413
    # without being read (1 h of 86-dim conditioners ≈ 25 MB of JSON,
    # so 64 MB is generous)
    timeout = 60.0           # socketserver read timeout (settimeout)
    max_body = 64 << 20

    def log_message(self, fmt, *args):  # quiet by default
        pass

    # one TCP segment per audio chunk: Nagle + delayed-ACK turns a
    # sequence of small writes into ~30-40 ms stalls PER CHUNK — with the
    # Pallas push at ~4 ms/20 ms-chunk that would dominate the stream RTF
    disable_nagle_algorithm = True

    def _chunk(self, data: bytes):
        # single write so the chunk header/payload/trailer never straddle
        # segments waiting on an ACK
        self.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")
        self.wfile.flush()

    def _json(self, code: int, obj: dict, close: bool = False):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        if close:
            self.send_header("Connection", "close")  # sets close_connection
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path == "/healthz":
            self._json(200, self.service.healthz())
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    def _body(self):
        length = int(self.headers.get("Content-Length", 0))
        if length > self.max_body:
            raise _TooLarge(length)
        return json.loads(self.rfile.read(length) or b"{}")

    def do_POST(self):
        try:
            body = self._body()
        except _TooLarge as e:
            # don't read the oversized body; close so the client can't
            # keep pumping it into a dead keep-alive connection
            return self._json(413, {"error": f"request body {e.length} "
                                             f"bytes exceeds cap "
                                             f"{self.max_body}"},
                              close=True)
        except (ValueError, json.JSONDecodeError) as e:
            return self._json(400, {"error": f"bad JSON: {e}"})
        try:
            if self.path == "/synthesize":
                wav = self.service.synthesize(body)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(wav)))
                self.end_headers()
                self.wfile.write(wav)
            elif self.path == "/stream":
                chunks = self.service.stream(body)
                try:
                    # prime the generator BEFORE sending headers: request
                    # validation raises at the first iteration, and a 400
                    # must not follow an already-sent 200 + chunked header
                    try:
                        first = next(chunks)
                    except StopIteration:
                        first = None
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     f"audio/L16;rate={SAMPLE_RATE}")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    # a mid-stream failure past this point terminates the
                    # connection without the 0-chunk: clients see a
                    # truncated chunked body (a detectable error), never a
                    # fake 200-OK
                    if first is not None:
                        self._chunk(first)
                        for chunk in chunks:
                            self._chunk(chunk)
                    self.wfile.write(b"0\r\n\r\n")
                finally:
                    # releases the stream slot / mux lane deterministically
                    # on any handler error (not just at GC time)
                    chunks.close()
            else:
                self._json(404, {"error": f"unknown path {self.path}"})
        except Overloaded as e:
            self._json(429, {"error": str(e)})
        except (KeyError, ValueError, TypeError) as e:
            self._json(400, {"error": str(e)})


def make_server(service: VocoderService, host: str = "127.0.0.1",
                port: int = 0, timeout_s: float = 60.0,
                max_body: int = 64 << 20) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; .server_address has the bound
    port when port=0. Call .serve_forever() (e.g. in a thread)."""
    handler = type("BoundHandler", (_Handler,),
                   {"service": service,
                    "timeout": float(timeout_s),
                    "max_body": int(max_body)})
    return ThreadingHTTPServer((host, port), handler)


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
    service = VocoderService(state["params"], cfg.model,
                             temperature_default=args.temperature,
                             frame_bucket=args.frame_bucket,
                             frames_per_push=args.frames_per_push,
                             max_batch=args.max_batch,
                             linger_ms=args.linger_ms,
                             max_streams=args.max_streams,
                             name=tag, artifact=artifact,
                             mux_lanes=args.mux_lanes)
    server = make_server(service, args.host, args.port,
                         timeout_s=args.timeout_s,
                         max_body=int(args.max_body_mb * (1 << 20)))
    print(f"serving {tag} on http://{args.host}:"
          f"{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
