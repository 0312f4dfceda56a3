"""VocoderService: the model + compiled generation callables behind HTTP.

The reference has no serving story — synthesis is the offline generate.py
writing WAV files (ref generate.py:98-112). This service exposes a loaded
checkpoint to the HTTP layer (msnv_tpu/serving/httpd.py):

  GET  /healthz     -> JSON {status, model, spk_dim, cond_dim, ...}
  POST /synthesize  -> complete WAV (audio/wav)
       JSON body: {"cond": [[...frame vectors (effective_cond_dim)...]],
                   "spk": int | [mix weights], "temperature": 1.0,
                   "seed": 0}
       "cond" may also be a base64 string of little-endian float32
       frame-major data — ~4x smaller and ~100x cheaper to parse than
       JSON float lists (the host-side knee under many concurrent
       streams).
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
  the lane-batched StreamMultiplexer (msnv_tpu/serving/mux.py): N
  concurrent /stream requests share one device carry and advance
  together per masked push, putting aggregate throughput at the
  batched-generation rate (scripts/bench_mux.py; scripts/serve_demo.py
  measured the raw batched envelope at ~500 realtime streams/chip).
"""

from __future__ import annotations

import threading

import numpy as np

from msnv_tpu.config import ModelConfig
from msnv_tpu.data.wavio import pcm16_bytes, wav_bytes
from msnv_tpu.serving.batcher import _Batcher
from msnv_tpu.serving.common import SAMPLE_RATE, Overloaded, _armed
from msnv_tpu.serving.mux import StreamMultiplexer


class VocoderService:
    """Holds the model + compiled generation callables for the server."""

    def __init__(self, params, cfg: ModelConfig, temperature_default=1.0,
                 frame_bucket: int = 16, frames_per_push: int = 1,
                 max_batch: int = 1, linger_ms: float = 10.0,
                 max_streams: int = 8, name: str = "msnv", artifact=None,
                 mux_lanes: int = 0, mesh=None):
        self.params = params
        self.cfg = cfg
        # multi-chip serving (SURVEY §5.8): with a jax.sharding.Mesh, the
        # /synthesize group call runs parallel.generate.
        # sharded_generate_fn_dynamic — request lanes shard over the
        # 'data' axis, params replicate, each chip generates its shard
        # (per-shard folded keys). Mux lanes likewise shard over 'data'
        # (StreamMultiplexer mesh mode); only the per-connection /stream
        # path stays single-device (a 1-lane carry has nothing to shard).
        self.mesh = mesh
        self._mesh_shards = int(mesh.shape["data"]) if mesh is not None else 1
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
            # with a mesh, mux lanes shard over its 'data' axis (the
            # /stream counterpart of the sharded /synthesize path)
            self._mux = StreamMultiplexer(
                params, cfg, lanes=mux_lanes,
                frames_per_push=max(self.frames_per_push, 1),
                temperature=self.temperature_default, mesh=mesh)
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
        C = self.cfg.effective_cond_dim
        raw = body["cond"]
        if isinstance(raw, str):
            # binary conditioners: base64 of little-endian float32,
            # frame-major (frames, C). A 2 s request is ~180 KB of b64
            # vs ~700 KB of JSON floats, and np.frombuffer replaces the
            # float-list parse — the dominant per-request host cost at
            # 100+ concurrent streams (GIL-bound JSON stampede).
            import base64
            import binascii
            try:
                buf = base64.b64decode(raw, validate=True)
            except binascii.Error as e:
                raise ValueError(f"cond base64: {e}")
            if len(buf) % (4 * C):
                raise ValueError(
                    f"cond base64 payload ({len(buf)} bytes) is not a "
                    f"whole number of {C}-dim float32 frames")
            cond = np.frombuffer(buf, "<f4").reshape(-1, C)
        else:
            cond = np.asarray(raw, np.float32)
        if cond.ndim != 2 or cond.shape[1] != C:
            raise ValueError(
                f"cond must be (frames, {C}), got {cond.shape}")
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
        # cond/spk stay HOST-side numpy: the jitted callables upload them
        # exactly where needed (one H2D per group call / pump tick). The
        # earlier jnp.asarray here cost every mux admission a blocking
        # device ROUND-TRIP (upload + the mux path's np.asarray readback,
        # serialized behind pump traffic on the tunnel — ~90 ms each, the
        # round-5 async-front-end stall; see docs/DESIGN.md).
        return cond, spk_arr, temperature, seed

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
                "mesh_shards": self._mesh_shards,
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
            cond = np.concatenate(
                [cond, np.repeat(cond[-1:], padded - n, axis=0)], axis=0)
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
        # a mesh shards lanes over 'data': round up so every shard gets
        # an equal slice (shard counts are powers of two on real pods, so
        # this usually coincides with the pow2 padding)
        if self._mesh_shards > 1:
            lanes = -(-lanes // self._mesh_shards) * self._mesh_shards
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
            # exported artifacts are single-device programs — a mesh
            # always takes the live sharded path
            if (art is not None and self.mesh is None
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
                    if self.mesh is not None:
                        from msnv_tpu.parallel.generate import (
                            sharded_generate_fn_dynamic)
                        self._gen_cache[temperature] = (
                            sharded_generate_fn_dynamic(
                                self.cfg, self.mesh,
                                temperature=temperature))
                    else:
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

    def parse_stream(self, body: dict):
        """Parse a /stream body and classify its path. Returns
        (cond, spk, temperature, seed, mux_eligible); raises
        ValueError/KeyError on malformed requests BEFORE any resource is
        taken. Used by the async front-end (serving/aio.py), which needs
        the raw lane machinery rather than the blocking iterator."""
        cond, spk, temperature, seed = self._parse(body)
        eligible = (self._mux is not None
                    and temperature == self._mux.temperature
                    and "seed" not in body)
        return cond, spk, temperature, seed, eligible

    def stream(self, body: dict, _parsed=None):
        """Yield PCM16 chunks as frame groups are generated. Trailing
        frames beyond a multiple of `frames_per_push` finish with 1-frame
        pushes (the carry pytree is compatible across push widths, and a
        K-frame push is sample-exact vs K single pushes).

        Raises Overloaded (HTTP 429) beyond `max_streams` concurrent
        streams; the slot is released when the generator finishes or is
        closed (client disconnect included). `_parsed` lets a front-end
        that already ran parse_stream forward the result instead of
        decoding the cond payload a second time."""
        # 400s must not consume a slot: parse before acquiring anything
        cond, spk, temperature, seed, eligible = (
            _parsed if _parsed is not None else self.parse_stream(body))
        if eligible:
            # seed-less default-temperature streams ride the multiplexer;
            # an explicit seed requests reproducible audio, which the
            # shared-key mux cannot honor — fall through to per-connection
            return self._mux_stream_iter(cond, spk)
        args = (cond, spk, temperature, seed)
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
            import queue as _q
            blocks = [cond_np[i:i + K]
                      for i in range(0, len(cond_np), K)]
            mux.feed(lane, blocks)
            q = mux.out_queue(lane)
            remaining = n * self.cfg.lookback
            got = 0
            while got < len(blocks):
                # coalesce whatever ticks have already drained into ONE
                # chunked write: under load a handler thread that fell
                # behind catches up with one syscall instead of one
                # write+flush per 5*K ms chunk (rows arrive as PCM16
                # from the pump's vectorized convert)
                pieces = [q.get(timeout=120.0)]
                got += 1
                while got < len(blocks):
                    try:
                        pieces.append(q.get_nowait())
                        got += 1
                    except _q.Empty:
                        break
                buf = (np.concatenate(pieces) if len(pieces) > 1
                       else pieces[0])
                take = min(len(buf), remaining)
                remaining -= take
                if take > 0:
                    yield buf[:take].tobytes()

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
