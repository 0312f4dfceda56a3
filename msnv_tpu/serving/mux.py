"""Lane-batched /stream multiplexer: N streams share one device carry."""

from __future__ import annotations

import threading

import numpy as np

from msnv_tpu.config import ModelConfig
from msnv_tpu.serving.common import Overloaded


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
    - carry lanes attach/detach dynamically: acquire() records the
      lane's speaker row and queues a DEFERRED splice; the pump's
      `_flush_attaches` splices fresh state (q_zero buffer, learned-h0
      hidden, speaker vector) into every pending lane in ONE masked
      device call at the start of its tick — N concurrent connects cost
      one dispatch, not N (the connect-stampede fix). `_masked_push`
      advances the batch and keeps inactive lanes' state frozen with
      jnp.where.
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
                 seed: int = 0, mesh=None):
        import queue as _queue

        import jax
        import jax.numpy as jnp
        from msnv_tpu.models.generate import streaming_fn

        self.cfg = cfg
        self.lanes = int(lanes)
        self.K = int(frames_per_push)
        self.temperature = float(temperature)
        self.mesh = mesh
        on_tpu = jax.devices()[0].platform == "tpu"
        use_pallas = on_tpu and temperature > 0.0
        if mesh is not None:
            # mux-over-mesh: the carry's lane axis is sharded over the
            # mesh's 'data' axis (parallel.sharded_streaming_fn) — one
            # pump drives lanes spread across a pod slice. The masked
            # freeze / attach splices below are plain elementwise ops on
            # the sharded carry; XLA keeps them shard-local under jit.
            from msnv_tpu.parallel.generate import sharded_streaming_fn
            shards = int(mesh.shape["data"])
            assert self.lanes % shards == 0, (
                f"mux lanes {self.lanes} must divide by the mesh data "
                f"axis {shards}")
            s_init, push = sharded_streaming_fn(
                params, cfg, mesh, frames_per_push=self.K,
                compute_dtype=jnp.bfloat16 if on_tpu else None,
                use_pallas=use_pallas,
                pallas_opts={"v2": True} if use_pallas else None,
                temperature=temperature)

            def init_state(batch, spk, key=None):
                assert batch == self.lanes, (batch, self.lanes)
                return s_init(jnp.asarray(spk), key)
        else:
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

        def attach_many_fn(carry, mask, spk_rows):
            # splice fresh stream state into EVERY masked lane in one
            # call: all-lane fresh state (q_zero buffer, learned h0,
            # spk_expand of the one-hot/mix rows — a one-hot matmul
            # selects the embedding row exactly, so int-id and row
            # representations are numerics-identical) + jnp.where.
            # One device call per pump tick regardless of how many
            # streams attached in the window — the per-connection
            # attach dispatch was the N-client connect-stampede cost.
            fresh = init_state(self.lanes, spk_rows, jax.random.PRNGKey(0))
            fs, fb, fh, _ = fresh
            spk_vec, buf, hs, key = carry
            spk_vec = jnp.where(mask[:, None], fs.astype(spk_vec.dtype),
                                spk_vec)
            buf = jnp.where(mask[:, None], fb, buf)
            hs = tuple(jnp.where(mask[None, :, None], fhi, h)
                       for fhi, h in zip(fh, hs))
            return (spk_vec, buf, hs, key)

        self._masked_push = masked_push
        self._attach_many = jax.jit(attach_many_fn)
        self._carry = init_state(
            self.lanes, jnp.zeros((self.lanes,), jnp.int32),
            jax.random.PRNGKey(seed))
        self._zeros_cond = np.zeros(
            (self.lanes, self.K, cfg.effective_cond_dim), np.float32)
        self._cv = threading.Condition()
        self._free = list(range(self.lanes))
        self._pending = {}     # lane -> list of (K, C) np blocks, FIFO
        self._out = {}         # lane -> queue.Queue of np audio chunks
        self._sinks = {}       # lane -> callable(bytes): direct delivery
        #                        (async front-end); bypasses _out
        self._gen = [0] * self.lanes   # lane reuse epoch: in-flight audio
        #                                of a released stream must never
        #                                reach the lane's NEXT occupant
        self._queue_cls = _queue.Queue
        self._stop = False
        self._thread = None
        self._inflight = []    # [(device audio, [(lane, gen) served])]
        # deferred attaches: acquire() only records the lane's speaker
        # row host-side; the pump splices ALL pending lanes in one
        # _attach_many call at the start of its next tick (before any
        # block of theirs can be pushed — feed() happens after acquire()
        # returns, and the tick pops attaches and blocks under the same
        # _cv hold). N concurrent connects cost one device call, not N.
        self._spk_rows = np.zeros((self.lanes, cfg.spk_dim), np.float32)
        self._pending_attach = set()
        # carry mutations (attach splices vs pump ticks) must be atomic:
        # an attach interleaved inside a pump's read-push-write would be
        # overwritten by the pushed carry. _carry_lock is the outer lock;
        # the device lock (shared with /synthesize) nests inside it.
        self._carry_lock = threading.Lock()
        self._device_lock = threading.Lock()

    # -- connection side --------------------------------------------------

    @staticmethod
    def _spk_row(spk, spk_dim):
        """Normalize a speaker spec (int id, (1,) int array, or (1, S) /
        (S,) float mix) to a float32 mix row — one-hot selects the
        embedding row exactly, so this is numerics-identical to the
        integer gather path."""
        arr = np.asarray(spk)
        if arr.dtype.kind in "iu":
            row = np.zeros((spk_dim,), np.float32)
            row[int(arr.reshape(-1)[0])] = 1.0
            return row
        row = arr.astype(np.float32).reshape(-1)
        assert row.shape[0] == spk_dim, (row.shape, spk_dim)
        return row

    def acquire(self, spk):
        """Reserve a lane and queue a fresh stream-state splice for it;
        returns the lane id. Raises Overloaded when all lanes are busy.

        The splice itself is DEFERRED to the pump's next tick
        (_flush_attaches): it is guaranteed to apply before any of this
        stream's conditioner blocks are pushed, because feed() can only
        run after acquire() returns and the pump pops pending attaches
        and pending blocks under the same _cv hold."""
        with self._cv:
            if not self._free:
                raise Overloaded(
                    f"all {self.lanes} multiplexer lanes busy")
            lane = self._free.pop()
            self._gen[lane] += 1
            self._pending[lane] = []
            self._out[lane] = self._queue_cls()
            self._spk_rows[lane] = self._spk_row(spk, self.cfg.spk_dim)
            self._pending_attach.add(lane)
        return lane

    def _flush_attaches(self, attach_lanes):
        """Apply deferred attach splices for `attach_lanes` in ONE device
        call. MUST be called under _carry_lock + _device_lock."""
        import jax.numpy as jnp
        if not attach_lanes:
            return
        mask = np.zeros((self.lanes,), bool)
        mask[list(attach_lanes)] = True
        self._carry = self._attach_many(
            self._carry, jnp.asarray(mask), jnp.asarray(self._spk_rows))

    def feed(self, lane: int, cond_blocks):
        """Queue (K, C) conditioner blocks for a lane and wake the pump."""
        with self._cv:
            self._pending[lane].extend(cond_blocks)
            self._cv.notify_all()

    def release(self, lane: int) -> None:
        with self._cv:
            self._pending.pop(lane, None)
            self._out.pop(lane, None)
            self._sinks.pop(lane, None)
            self._pending_attach.discard(lane)
            self._free.append(lane)

    def out_queue(self, lane: int):
        return self._out[lane]

    def set_sink(self, lane: int, cb) -> None:
        """Route the lane's audio to `cb(pcm16_bytes)` instead of its
        out-queue. `cb` is invoked from the PUMP thread once per drained
        tick — it must be cheap and non-blocking (the async front-end's
        sink just records the bytes and schedules one event-loop wakeup).
        Cleared automatically on release()."""
        with self._cv:
            self._sinks[lane] = cb

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
        # one vectorized float->PCM16 convert per tick instead of one
        # per lane per handler thread (the handlers just .tobytes()):
        # at N lanes this moves N small GIL-holding converts into a
        # single numpy pass — out_queue consumers receive int16 rows
        pcm = (np.clip(audio, -1.0, 1.0 - 1.0 / 32768)
               * 32768.0).astype("<i2")
        for lane, gen in served:
            # drop audio of released streams; the gen check stops a
            # recycled lane's new occupant from receiving it
            if self._gen[lane] != gen:
                continue
            sink = self._sinks.get(lane)
            if sink is not None:
                sink(pcm[lane].tobytes())
                continue
            q = self._out.get(lane)
            if q is not None:
                q.put(pcm[lane])

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
                attach_lanes = ()
                if any(self._pending.values()):
                    cond = self._zeros_cond.copy()
                    for lane, blocks in self._pending.items():
                        if blocks:
                            cond[lane] = blocks.pop(0)
                            served.append((lane, self._gen[lane]))
                    # pop deferred attaches under the SAME _cv hold as
                    # the block pop: every acquire whose feed produced a
                    # popped block is in this snapshot (or was applied
                    # by an earlier tick)
                    attach_lanes = self._pending_attach
                    self._pending_attach = set()
            if cond is None:
                # woke only to drain
                self._drain_one()
                continue
            active = np.zeros((self.lanes,), bool)
            active[[lane for lane, _ in served]] = True
            with self._carry_lock, self._device_lock:
                self._flush_attaches(attach_lanes)
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
