"""Trainer: TBPTT epoch loop with plugin events and exact resume.

Re-design of ref trainer/__init__.py:9-117. The torch version re-implements
torch 0.4's Trainer with heap-based plugin queues and a closure-style
optimizer step; here the compiled train step owns the math and the Trainer
owns the loop, the streaming loaders, plugin dispatch, and resumable
training state (epoch, iteration, TBPTT hidden, data cursor).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from msnv_tpu.config import ExperimentConfig, make_tag
from msnv_tpu.models.samplernn import init_tier_state
from msnv_tpu.training.step import make_eval_step, make_train_step


class Trainer:
    #: device-corpus "auto" threshold: upload a corpus to HBM only below
    #: this footprint (big corpora must keep streaming from host RAM)
    DEVICE_CORPUS_MAX_BYTES = 2 << 30

    def __init__(self, cfg: ExperimentConfig, params, optimizer, loader,
                 mesh=None, compute_dtype=None, device_corpus="auto"):
        self.cfg = cfg
        self.tag = make_tag(cfg)
        self.params = params
        self.optimizer = optimizer
        self.opt_state = optimizer.init(params)
        self.loader = loader
        self.mesh = mesh
        self.state = init_tier_state(cfg.model, loader._qdata.shape[0])
        self.epochs = 0        # completed epochs (resume sets this)
        self.iterations = 0
        self.chunk_index = 0   # data cursor within the current epoch
        self.start_chunk = 0   # mid-epoch resume point
        self.stats = {}
        self.plugins = []
        self.compute_dtype = compute_dtype
        self.device_corpus = device_corpus
        self.scan_block = 16          # chunks per multi-step executable
        self._corpus_dev = None       # device-resident packed corpus
        self._step_indexed = None
        self._train_scan = None
        self._eval_dev = {}           # loader -> (corpus_dev, eval_scan)
        self._eval_step_indexed = {}  # geometry -> per-step eval fn

        # exposure-bias mitigation (config.TrainConfig.ss_prob /
        # input_noise_prob): the train-step builders grow a trailing
        # per-step PRNG key; eval and generation are untouched
        from msnv_tpu.training.step import exposure_tuple
        self._exposure = exposure_tuple(cfg.train)
        if self._exposure is not None:
            import jax as _jax
            self._exp_key = _jax.random.PRNGKey(
                (cfg.train.seed + 0x55) & 0x7FFFFFFF)

        self.is_gan = cfg.model.variant == "gan"
        if self.is_gan and self._exposure is not None:
            raise ValueError(
                "ss_prob/input_noise_prob are not supported with the GAN "
                "variant (the adversarial step has its own two-loss "
                "forward); fine-tune the identity/bottleneck heads")
        if self.is_gan:
            # adversarial variant: discriminator + second optimizer + the
            # two-loss step (ref run_samplegan.sh; SURVEY.md §2.8) — same
            # mesh/device-corpus treatment as the identity path
            import jax
            from msnv_tpu.models.discriminator import discriminator_init
            from msnv_tpu.training.gan import make_gan_train_step
            self.disc_params = discriminator_init(
                jax.random.PRNGKey(cfg.train.seed + 1), cfg.model.spk_dim,
                channels=cfg.train.disc_channels)
            self.disc_opt = optimizer  # same clipped-Adam recipe
            self.disc_opt_state = self.disc_opt.init(self.disc_params)
            gan_builder = make_gan_train_step(
                cfg.model, cfg.train, optimizer, self.disc_opt, mesh=mesh,
                compute_dtype=compute_dtype)
            self._gan_step = (
                gan_builder if mesh is None else
                gan_builder(*self._gan_templates()))
            eval_builder = make_eval_step(cfg.model, mesh=mesh)
            self._eval = (eval_builder if mesh is None else
                          eval_builder(self.params, self.state))
        else:
            step_builder = make_train_step(cfg.model, optimizer, mesh=mesh,
                                           compute_dtype=compute_dtype,
                                           exposure=self._exposure)
            eval_builder = make_eval_step(cfg.model, mesh=mesh)
            if mesh is None:
                self._step = step_builder
                self._eval = eval_builder
            else:
                self._step = step_builder(self.params, self.opt_state,
                                          self.state)
                self._eval = eval_builder(self.params, self.state)

        # device-resident corpus: upload the packed arrays ONCE and slice
        # chunks in-jit by index (training/step.chunk_slices) — removes
        # the ~MB/step host->device chunk upload, the dominant wall-clock
        # cost on hosts with slow accelerator interconnect.
        if self._want_device_corpus(loader):
            # window geometry comes from the LOADER (its seq_len/overlap
            # define the windows get_chunk would produce), never from the
            # train config — they agree in the CLI but the API allows any
            # loader
            geo = (loader.seq_len, loader.overlap_len, loader.cond_in_seq)
            if mesh is None:
                self._corpus_dev = loader.device_arrays()
            else:
                # lanes sharded over 'data' (static lane<->replica
                # assignment, as TBPTT state carry requires)
                from msnv_tpu.parallel.mesh import corpus_sharding
                self._corpus_dev = loader.device_arrays(
                    shardings=corpus_sharding(mesh))
            if self.is_gan:
                from msnv_tpu.training.gan import (
                    make_gan_train_block_scan, make_gan_train_step_indexed)
                if mesh is None:
                    self._step_indexed = make_gan_train_step_indexed(
                        cfg.model, cfg.train, optimizer, self.disc_opt,
                        *geo, compute_dtype=compute_dtype)
                else:
                    self._step_indexed = None  # block scan only
                scan_builder = make_gan_train_block_scan(
                    cfg.model, cfg.train, optimizer, self.disc_opt, *geo,
                    mesh=mesh, compute_dtype=compute_dtype)
                self._train_scan = (
                    scan_builder if mesh is None else
                    scan_builder(*self._gan_templates()))
            else:
                from msnv_tpu.training.step import (make_train_block_scan,
                                                    make_train_step_indexed)
                if mesh is None:
                    self._step_indexed = make_train_step_indexed(
                        cfg.model, optimizer, *geo,
                        compute_dtype=compute_dtype,
                        exposure=self._exposure)
                else:
                    self._step_indexed = None  # block scan only
                # multi-step executable: one dispatch + one loss fetch per
                # scan_block chunks (the per-step path stays for runs with
                # mid-epoch interval savers)
                scan_builder = make_train_block_scan(
                    cfg.model, optimizer, *geo, mesh=mesh,
                    compute_dtype=compute_dtype, exposure=self._exposure)
                self._train_scan = (
                    scan_builder if mesh is None else
                    scan_builder(self.params, self.opt_state, self.state))

    def _gan_templates(self):
        """(params, disc, main_opt, disc_opt, state) sharding templates."""
        return (self.params, self.disc_params, self.opt_state,
                self.disc_opt_state, self.state)

    def _want_device_corpus(self, loader) -> bool:
        if self.device_corpus in (False, "false"):
            return False
        if self.device_corpus in (True, "true"):
            return True
        return loader.device_bytes() <= self.DEVICE_CORPUS_MAX_BYTES

    # -- plugins ----------------------------------------------------------
    def register_plugin(self, plugin):
        plugin.register(self)
        self.plugins.append(plugin)
        return plugin

    def _call_plugins(self, event: str, *args):
        for p in self.plugins:
            getattr(p, event)(*args)

    # -- training ---------------------------------------------------------
    def train_chunk(self, chunk):
        """One optimizer step on one TBPTT chunk; returns loss (bits)."""
        if self.is_gan:
            (self.params, self.disc_params, self.opt_state,
             self.disc_opt_state, self.state, metrics) = self._gan_step(
                self.params, self.disc_params, self.opt_state,
                self.disc_opt_state, self.state,
                jnp.asarray(float(self.iterations)),
                jnp.asarray(chunk.data), jnp.asarray(chunk.reset),
                jnp.asarray(chunk.target), jnp.asarray(chunk.cond),
                jnp.asarray(chunk.spk))
            self._record_gan_metrics(metrics, scalar=True)
            return metrics["loss"]
        extra = ()
        if self._exposure is not None:
            import jax
            # one fresh key per optimizer step, deterministic in
            # (seed, iteration) so resume replays the same stream
            extra = (jax.random.fold_in(self._exp_key, self.iterations),)
        self.params, self.opt_state, self.state, loss = self._step(
            self.params, self.opt_state, self.state,
            jnp.asarray(chunk.data), jnp.asarray(chunk.reset),
            jnp.asarray(chunk.target), jnp.asarray(chunk.cond),
            jnp.asarray(chunk.spk), *extra)
        return loss

    def _pipelining_allowed(self) -> bool:
        """Loss-fetch pipelining (and block scanning) runs a plugin's
        iteration(k) callback AFTER later steps were dispatched, so any
        plugin that snapshots trainer params/state per iteration would
        capture future state. Plugins declare that need via
        `needs_sync_state` (Plugin base attr; SaverPlugin sets it when
        interval-saving) and force the synchronous per-step loop."""
        return not any(getattr(p, "needs_sync_state", False)
                       for p in self.plugins)

    def _record_gan_metrics(self, metrics, scalar=False):
        """Track disc_loss / lambda stats (last value of the step/block)."""
        for name in ("disc_loss", "lambda"):
            v = metrics[name] if scalar else metrics[name][-1]
            self.stats.setdefault(name, {})["last"] = float(v)

    def _run_scan_block(self, ks) -> np.ndarray:
        """One multi-step executable dispatch; returns per-chunk losses."""
        if self.is_gan:
            (self.params, self.disc_params, self.opt_state,
             self.disc_opt_state, self.state, metrics) = self._train_scan(
                self.params, self.disc_params, self.opt_state,
                self.disc_opt_state, self.state,
                jnp.asarray(float(self.iterations)),
                self._corpus_dev, jnp.asarray(ks))
            self._record_gan_metrics(metrics)
            return np.asarray(metrics["loss"])
        (self.params, self.opt_state, self.state,
         losses) = self._train_scan(
            self.params, self.opt_state, self.state,
            self._corpus_dev, jnp.asarray(ks), *self._epoch_key())
        return np.asarray(losses)

    def _epoch_key(self):
        """Exposure base key for the device-corpus paths: per-epoch, the
        chunk index is folded in by the step/scan body — deterministic in
        (seed, epoch, chunk), replayed exactly on resume."""
        if self._exposure is None:
            return ()
        import jax
        return (jax.random.fold_in(self._exp_key, self.epochs),)

    def _run_step_indexed(self, k):
        """One indexed device-corpus step; returns the chunk loss."""
        if self.is_gan:
            (self.params, self.disc_params, self.opt_state,
             self.disc_opt_state, self.state,
             metrics) = self._step_indexed(
                self.params, self.disc_params, self.opt_state,
                self.disc_opt_state, self.state,
                jnp.asarray(float(self.iterations)),
                self._corpus_dev, np.int32(k))
            self._record_gan_metrics(metrics, scalar=True)
            return metrics["loss"]
        (self.params, self.opt_state, self.state,
         loss) = self._step_indexed(
            self.params, self.opt_state, self.state,
            self._corpus_dev, np.int32(k), *self._epoch_key())
        return loss

    def train_epoch(self, start_chunk: int = 0):
        """One epoch. When allowed, the loss fetch is pipelined one step
        behind the device: step k+1 is dispatched BEFORE float(loss_k)
        blocks, so the scalar's host round trip overlaps compute instead
        of stalling it."""
        pipelined = self._pipelining_allowed()
        pending = None
        if self._train_scan is not None and pipelined:
            # multi-step executables: scan_block chunks per dispatch, one
            # loss-vector fetch per block. The trailing partial block runs
            # through the per-step executable (one compile serves every
            # remainder size); mesh runs scan it (one extra executable).
            ks = np.arange(start_chunk, len(self.loader), dtype=np.int32)
            n_full = (len(ks) // self.scan_block) * self.scan_block
            for i in range(0, n_full, self.scan_block):
                blk = ks[i:i + self.scan_block]
                for k, loss in zip(blk, self._run_scan_block(blk)):
                    self._flush_iteration(int(k), loss)
            rest = ks[n_full:]
            if len(rest) and self._step_indexed is not None:
                for k in rest:
                    loss = self._run_step_indexed(k)
                    self._flush_iteration(int(k), loss)
            elif len(rest):
                for k, loss in zip(rest, self._run_scan_block(rest)):
                    self._flush_iteration(int(k), loss)
        elif self._step_indexed is not None:
            # interval savers need per-step state visibility (mesh runs
            # with interval savers use the host-sliced loop below)
            for k in range(start_chunk, len(self.loader)):
                loss = self._run_step_indexed(k)
                self._flush_iteration(k, loss)
        else:
            for chunk in self.loader.epoch(start_chunk=start_chunk):
                loss = self.train_chunk(chunk)
                if pending is not None:
                    self._flush_iteration(*pending)
                if pipelined:
                    pending = (chunk.index, loss)
                else:
                    self._flush_iteration(chunk.index, loss)
        if pending is not None:
            self._flush_iteration(*pending)

    def _flush_iteration(self, index: int, loss):
        self.chunk_index = index
        self.iterations += 1
        self._call_plugins("iteration", float(loss))

    def run(self, epoch_limit: int):
        """Run up to epoch_limit epochs, resuming from self.epochs (and,
        for a mid-epoch checkpoint, from self.start_chunk) —
        ref trainer/__init__.py:52-60 plus exact-cursor resume."""
        self.epoch_limit = epoch_limit   # plugins may key off the final epoch
        first = True
        for epoch in range(self.epochs + 1, epoch_limit + 1):
            self.train_epoch(self.start_chunk if first else 0)
            first = False
            self.start_chunk = 0
            self.epochs = epoch
            self._call_plugins("epoch", epoch)

    # -- evaluation -------------------------------------------------------
    def evaluate(self, loader) -> float:
        """Mean NLL-bits over a partition, loss*batch_size weighted like the
        reference (ref plugins.py:51-92). Uses fresh hidden state. Losses
        are fetched ONCE at the end (one round trip per partition, not per
        chunk); evaluation corpora ride the device-resident path too when
        training does."""
        state = init_tier_state(self.cfg.model, loader._qdata.shape[0])
        losses = []
        if self._corpus_dev is not None \
                and self._want_device_corpus(loader):
            # keyed by the loader OBJECT (a held reference — id() reuse
            # after GC must not alias corpora); the training loader
            # reuses the already-resident corpus
            if loader not in self._eval_dev:
                from msnv_tpu.training.step import make_eval_block_scan
                geo = (loader.seq_len, loader.overlap_len,
                       loader.cond_in_seq)
                if self.mesh is None:
                    corpus_dev = (self._corpus_dev
                                  if loader is self.loader else
                                  loader.device_arrays())
                    eval_scan = make_eval_block_scan(self.cfg.model, *geo)
                else:
                    from msnv_tpu.parallel.mesh import corpus_sharding
                    corpus_dev = (self._corpus_dev
                                  if loader is self.loader else
                                  loader.device_arrays(
                                      shardings=corpus_sharding(self.mesh)))
                    eval_scan = make_eval_block_scan(
                        self.cfg.model, *geo,
                        mesh=self.mesh)(self.params, state)
                self._eval_dev[loader] = (corpus_dev, eval_scan)
            corpus_dev, eval_scan = self._eval_dev[loader]
            ks = np.arange(len(loader), dtype=np.int32)
            n_full = (len(ks) // self.scan_block) * self.scan_block
            blocks = []
            for i in range(0, n_full, self.scan_block):
                blk = ks[i:i + self.scan_block]
                blk_losses, state = eval_scan(self.params, state,
                                              corpus_dev, jnp.asarray(blk))
                blocks.append(blk_losses)
            rest = ks[n_full:]
            if len(rest) and self.mesh is None:
                # one per-step executable serves every remainder size
                geo = (loader.seq_len, loader.overlap_len,
                       loader.cond_in_seq)
                if geo not in self._eval_step_indexed:
                    from msnv_tpu.training.step import make_eval_step_indexed
                    self._eval_step_indexed[geo] = make_eval_step_indexed(
                        self.cfg.model, *geo)
                eval_step = self._eval_step_indexed[geo]
                for k in rest:
                    loss, state = eval_step(self.params, state, corpus_dev,
                                            np.int32(k))
                    blocks.append(loss[None])
            elif len(rest):
                blk_losses, state = eval_scan(self.params, state,
                                              corpus_dev, jnp.asarray(rest))
                blocks.append(blk_losses)
            if not blocks:
                return 0.0
            return float(jnp.concatenate(blocks).mean())
        else:
            for chunk in loader.epoch():
                loss, state = self._eval(
                    self.params, state, jnp.asarray(chunk.data),
                    jnp.asarray(chunk.reset), jnp.asarray(chunk.target),
                    jnp.asarray(chunk.cond), jnp.asarray(chunk.spk))
                losses.append(loss)
        if not losses:
            return 0.0
        # every chunk carries the full lane batch (full windows only), so
        # the reference's loss*batch averaging reduces to the mean
        return float(jnp.stack(losses).mean())

    # -- checkpoint interface ---------------------------------------------
    def checkpoint_state(self):
        """Full resumable state pytree (params + opt + TBPTT hidden)."""
        out = {
            "params": self.params,
            "opt_state": self.opt_state,
            "tier_state": self.state,
        }
        if self.is_gan:
            out["disc_params"] = self.disc_params
            out["disc_opt_state"] = self.disc_opt_state
        return out

    def restore(self, state, meta):
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.state = state["tier_state"]
        if self.is_gan and "disc_params" in state:
            self.disc_params = state["disc_params"]
            self.disc_opt_state = state["disc_opt_state"]
        self.epochs = int(meta.get("epoch", 0))
        self.iterations = int(meta.get("iteration", 0))
        # mid-epoch cursor: next chunk to train within epoch self.epochs+1
        self.start_chunk = int(meta.get("chunk", 0))
