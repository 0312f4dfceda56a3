"""Autoregressive generation as nested `lax.scan` — the TPU answer to the
reference's one-Python-iteration-per-sample loop (ref model.py:439-520).

Semantics parity with `Generator.__call__`:
- output length == num_cond_frames * lookback; the requested sample_length
  is ignored (ref model.py:455 — deliberate quirk parity)
- the sequence is seeded with `lookback` samples of q_zero (ref model.py:459)
- tier t fires every ns_frame_samples[t] samples; the top tier consumes cond
  frame j = i//lookback - 1 and the speaker embedding; lower tiers consume
  the parent's upsampled slot (i // nfs[t]) % frame_sizes[t+1]
  (ref model.py:462-501)
- the sample MLP sees the last frame_sizes[0] raw samples + tier-0's slot
  i % frame_sizes[0], and samples from the 256-way softmax
  (ref model.py:504-517)
- tier inputs are 2 * dequantize(prev) like training (ref model.py:471)

Structure: one scan level per tier — outer scan over cond frames (top tier
step), a scan over its frame_size slots (next tier down), ..., innermost scan
over the bottom tier's slots doing embed-gather + MLP + categorical sample.
All weights stay on device; the per-sample embedding+conv collapses to a
fused (fs0, q, dim) table gather (the conv over one-hot sample ids is
linear), so per-sample HBM traffic is just the MLP hidden/out matmuls.

Carry: (ring buffer of the last `lookback` samples, per-tier GRU states,
PRNG key). Static shapes throughout; no Python control flow inside jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.conditioner import conditioner_apply
from msnv_tpu.models.samplernn import (dequantize, mlp_conv_weight,
                                       rnn_cell)
from msnv_tpu.ops.linear import dense_apply
from msnv_tpu.ops.quantize import q_zero
from msnv_tpu.ops.upsample import upsample_step


def fused_embed_conv(mlp_params):
    """(fs0, q, dim) table T with T[p, s] = embedding[s] @ conv_w[p].

    The MLP input conv over embedded samples is linear in the one-hot sample
    ids, so per-sample inference needs only fs0 row-gathers instead of a
    (fs0*q, dim) matmul. Weight-norm is folded in.
    """
    w = mlp_conv_weight(mlp_params)            # (fs0, q_emb, dim)
    emb = mlp_params["embedding"]              # (q, q_emb)
    return jnp.einsum("se,peo->pso", emb, w)   # (fs0, q, dim)


def cast_float_tree(tree, dtype):
    """Cast floating leaves to `dtype` (bf16 generation path); ints kept."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def _mlp_logits(params, fused_table, buf, slot):
    """Pre-softmax logits (f32) for the next sample.

    buf: (B, >=fs0) int ring buffer; slot: (B, dim) tier-0 conditioning.
    Matmuls run in the table/weight dtype (bf16-capable); the final logits
    accumulate in f32 so the softmax/sampling are precision-stable.
    """
    fs0 = fused_table.shape[0]
    x = slot
    for p in range(fs0):  # static unroll: fs0 gathers of (B, dim) rows
        x = x + fused_table[p][buf[:, -fs0 + p]]
    x = jax.nn.relu(x)
    x = jax.nn.relu(dense_apply(params["mlp"]["hidden"], x))
    out = params["mlp"]["out"]
    from msnv_tpu.ops.linear import dense_weight
    logits = jnp.einsum("bi,oi->bo", x, dense_weight(out),
                        preferred_element_type=jnp.float32)
    return logits + out["b"].astype(jnp.float32)


def _check_temperature(temperature):
    """Static sanity: a negative/NaN temperature would silently sample the
    LEAST likely levels (logits flip sign); fail loudly instead."""
    import math
    if not (isinstance(temperature, (int, float))
            and math.isfinite(temperature) and temperature >= 0.0):
        raise ValueError(
            f"temperature must be a finite float >= 0, got {temperature!r}")


def _mlp_sample(params, fused_table, buf, slot, key, temperature=1.0):
    """One sample: fused-gather MLP + categorical draw -> (B,) int32.

    `temperature` is a static python float: 1.0 keeps the reference's
    multinomial-from-softmax semantics (ref model.py:514-517); 0.0 is
    greedy argmax; other values scale the logits (the standard mitigation
    for the thesis's generation-saturation bursts, ref doc §4.3).
    """
    logits = _mlp_logits(params, fused_table, buf, slot)
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temperature != 1.0:
        logits = logits / temperature
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return jax.random.categorical(key, log_probs, axis=-1).astype(jnp.int32)


def _pallas_window_sampler(params, cfg: ModelConfig, fused_table,
                           pallas_opts, temperature=1.0):
    """(carry, slots (B, fs0, dim)) -> (carry, samples (B, fs0)) via the
    fused Pallas kernel (msnv_tpu/pallas/sample_kernel.py).

    Dispatch: interpret mode (CPU tests) runs the v1 reference kernel with
    precomputed Gumbel noise; on TPU the multi-tile v2 kernel is the
    default and {"v3": True} selects the slot-row-streaming variant
    (tile_b up to 128 — best at B >= 512).

    Temperature needs NO kernel change: the kernel draws
    argmax(logits + gumbel), and argmax(logits/T + g) is achieved exactly
    by feeding it w_out/T and b_out/T (the logits are affine in them).
    Greedy (T == 0) is XLA-path only — the kernel PRNG cannot be disabled.
    """
    from msnv_tpu.ops.linear import dense_weight
    from msnv_tpu.pallas.sample_kernel import (gumbel_noise,
                                               make_sample_window,
                                               make_sample_window_v2,
                                               make_sample_window_v3)

    if temperature <= 0.0:
        raise ValueError("the pallas sampler needs temperature > 0 "
                         "(greedy decoding runs on the XLA path)")
    fs0 = cfg.frame_sizes[0]
    q = cfg.q_levels
    table = fused_table.reshape(fs0 * q, cfg.dim)
    wh = dense_weight(params["mlp"]["hidden"]).T
    bh = params["mlp"]["hidden"]["b"].astype(jnp.float32)[None, :]
    wo = dense_weight(params["mlp"]["out"]).T
    bo = params["mlp"]["out"]["b"].astype(jnp.float32)
    if temperature != 1.0:   # T==1 keeps the HLO byte-identical (compile
        inv_t = 1.0 / temperature             # cache stays valid)
        wo = wo * inv_t
        bo = bo * inv_t
    wo = wo.astype(table.dtype)
    bo = bo[None, :]

    interp = pallas_opts.get("interpret", False)
    use_v3 = pallas_opts.get("v3", False)
    cache = {}

    def _pad_batch(x, batch, padded):
        """Zero-pad the lane axis (axis 0) up to `padded` lanes."""
        if padded == batch:
            return x
        pad = [(0, padded - batch)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    if interp:
        # CPU interpret mode (tests): the reference-math kernel with
        # precomputed Gumbel noise in ONE single-program call — the
        # in-kernel TPU PRNG of v2/v3 has no interpret support. Interpret
        # batches are tiny, so no batch tiling is needed.
        def run(carry, slots):
            buf, hs, key = carry
            batch = slots.shape[0]
            key, sub = jax.random.split(key)
            noise = gumbel_noise(sub, (fs0, batch, q))
            if batch not in cache:
                cache[batch] = make_sample_window(
                    fs0, q, cfg.dim, batch, tile_b=batch, interpret=True)
            samples = cache[batch](
                table, wh.astype(table.dtype), bh, wo, bo,
                jnp.swapaxes(slots, 0, 1).astype(table.dtype),
                buf[:, -fs0:], noise)
            buf = jnp.concatenate([buf[:, fs0:], samples], axis=1)
            return (buf, hs, key), samples

        return run

    # on-TPU: one multi-tile grid call, weights fetched once across tiles,
    # in-kernel PRNG. v2 (default) lands each tile's slot window in VMEM
    # whole; v3 streams slot rows with a 2-deep double buffer so tile_b
    # can reach 128 (best at B >= 512, see docs/VALIDATION.md).
    maker = make_sample_window_v3 if use_v3 else make_sample_window_v2
    v2_tile = pallas_opts.get("tile_b", 128 if use_v3 else 32)

    def run(carry, slots):
        buf, hs, key = carry
        batch = slots.shape[0]
        # tiles must be a multiple of the 8-lane sublane minimum
        # (Mosaic cannot lower odd-sized lane blocks); batches below /
        # between multiples are zero-padded up and sliced away
        tb = -(-max(min(v2_tile, batch), 8) // 8) * 8
        # pad to a tile multiple; padded lanes compute garbage that is
        # sliced away (their windows/slots are zeros — harmless)
        n_tiles = -(-batch // tb)
        padded = n_tiles * tb
        if padded not in cache:
            cache[padded] = maker(fs0, q, cfg.dim, padded, tile_b=tb)
        key, sub = jax.random.split(key)
        seed = (sub[0] ^ sub[1]).astype(jnp.int32)[None]
        slots_p = _pad_batch(slots.astype(table.dtype), batch, padded)
        slots_t = jnp.swapaxes(slots_p, 0, 1)
        slots_tiled = slots_t.reshape(
            fs0, n_tiles, tb, cfg.dim).transpose(1, 0, 2, 3)
        window = _pad_batch(buf[:, -fs0:], batch, padded)
        samples = cache[padded](
            seed, table, wh.astype(table.dtype), bh, wo, bo,
            slots_tiled, window)[:batch]
        buf = jnp.concatenate([buf[:, fs0:], samples], axis=1)
        return (buf, hs, key), samples

    return run


def _make_level(params, cfg: ModelConfig, t: int, fused_table,
                pallas_opts=None, unroll=1, temperature=1.0):
    """Scan-step fn for tier t: (carry, upper_slot) -> (carry, (B, nfs[t])).

    carry = (buf (B, lookback) int32, hs tuple of (n_rnn, B, dim), key).
    `upper_slot` is the parent's (B, dim) upsampled conditioning vector.
    `unroll` unrolls the innermost (per-sample) scan body.
    """
    tier = params["tiers"][t]
    nfs = cfg.ns_frame_samples[t]

    window_sampler = None
    if t == 0:
        if pallas_opts is not None:
            window_sampler = _pallas_window_sampler(params, cfg, fused_table,
                                                    pallas_opts, temperature)

        def sample_step(carry, slot):
            buf, hs, key = carry
            key, sub = jax.random.split(key)
            s = _mlp_sample(params, fused_table, buf, slot, sub, temperature)
            buf = jnp.concatenate([buf[:, 1:], s[:, None]], axis=1)
            return (buf, hs, key), s
    else:
        sample_step = _make_level(params, cfg, t - 1, fused_table,
                                  pallas_opts, unroll, temperature)

    wdtype = tier["input_expand"]["w"].dtype

    def level_step(carry, upper_slot):
        buf, hs, key = carry
        prev = (2.0 * dequantize(cfg, buf[:, -nfs:])).astype(wdtype)
        x = dense_apply(tier["input_expand"], prev) + upper_slot
        y, h_new = rnn_cell(cfg, tier["gru"], x, hs[t])
        hs = tuple(h_new if i == t else h for i, h in enumerate(hs))
        slots = upsample_step(tier["upsample"], y)        # (B, fs, dim)
        if window_sampler is not None:
            (buf, hs, key), samples = window_sampler((buf, hs, key), slots)
            return (buf, hs, key), samples
        (buf, hs, key), ys = jax.lax.scan(
            sample_step, (buf, hs, key), jnp.swapaxes(slots, 0, 1),
            unroll=unroll if t == 0 else 1)
        # ys: (fs, B) for t==0 else (fs, B, nfs[t-1])
        samples = jnp.moveaxis(ys, 0, 1).reshape(ys.shape[1], nfs)
        return (buf, hs, key), samples

    return level_step


def _mlp_log_probs(params, fused_table, buf, slot):
    """Log-probs for the next sample given the ring buffer and tier-0 slot."""
    return jax.nn.log_softmax(
        _mlp_logits(params, fused_table, buf, slot), axis=-1)


def _make_level_forced(params, cfg: ModelConfig, t: int, fused_table):
    """Teacher-forced twin of _make_level: consumes (upper_slot, forced
    samples) and emits per-position log-probs instead of sampling. Used by
    the generation<->predictor equivalence test."""
    tier = params["tiers"][t]
    nfs = cfg.ns_frame_samples[t]
    fs = cfg.frame_sizes[t]

    if t == 0:
        def sample_step(carry, xs):
            slot, forced_s = xs           # (B, dim), (B,)
            buf, hs = carry
            lp = _mlp_log_probs(params, fused_table, buf, slot)
            buf = jnp.concatenate([buf[:, 1:], forced_s[:, None]], axis=1)
            return (buf, hs), lp
    else:
        sample_step = _make_level_forced(params, cfg, t - 1, fused_table)

    def level_step(carry, xs):
        upper_slot, forced = xs           # forced: (B, nfs)
        buf, hs = carry
        prev = 2.0 * dequantize(cfg, buf[:, -nfs:])
        x = dense_apply(tier["input_expand"], prev) + upper_slot
        y, h_new = rnn_cell(cfg, tier["gru"], x, hs[t])
        hs = tuple(h_new if i == t else h for i, h in enumerate(hs))
        slots = upsample_step(tier["upsample"], y)
        forced_slots = jnp.moveaxis(
            forced.reshape(forced.shape[0], fs, nfs // fs), 1, 0)
        if t == 0:
            forced_slots = forced_slots[..., 0]   # (fs, B)
        (buf, hs), lps = jax.lax.scan(
            sample_step, (buf, hs),
            (jnp.swapaxes(slots, 0, 1), forced_slots))
        # lps: (fs, B, ..., q) -> (B, nfs, q)
        q = lps.shape[-1]
        out = jnp.moveaxis(lps, 0, 1).reshape(lps.shape[1], nfs, q)
        return (buf, hs), out

    return level_step


def streaming_fn(params, cfg: ModelConfig, compute_dtype=None,
                 use_pallas=False, pallas_opts=None, frames_per_push=1,
                 temperature=1.0):
    """Streaming generation: push conditioner frames, pull samples, O(1)
    carried state — unbounded audio with constant memory.

    Returns (init_state, push) where:
      init_state(batch, spk, [key]) -> carry
      push(carry, cond (B, effective_cond_dim) when frames_per_push == 1,
        else (B, frames_per_push, effective_cond_dim)) -> (carry, audio
        (B, frames_per_push*lookback) float32, samples (same) int32)

    The per-frame math is identical to generate_fn (same scans below the
    frame level), so a sequence of push() calls reproduces a batch
    generate() with the same key exactly — and a K-frame push equals K
    1-frame pushes exactly (the PRNG key threads through the same splits).
    Serving usage: keep `carry` on device between requests; each push is
    one jitted call. frames_per_push > 1 amortizes per-dispatch overhead
    when the latency SLO allows K*5 ms chunks.
    """
    _check_temperature(temperature)
    if compute_dtype is not None:
        params = cast_float_tree(params, compute_dtype)
    if use_pallas:
        assert cfg.n_tiers >= 2
        pallas_opts = dict(pallas_opts or {})
    else:
        pallas_opts = None
    top = cfg.n_tiers - 1
    tier = params["tiers"][top]
    nfs_top = cfg.ns_frame_samples[top]
    fused = fused_embed_conv(params["mlp"])
    below = (_make_level(params, cfg, top - 1, fused, pallas_opts,
                         temperature=temperature)
             if top > 0 else None)
    wdtype = tier["input_expand"]["w"].dtype

    def frame_step(spk_vec, carry, cond_j):
        buf, hs, key = carry
        prev = (2.0 * dequantize(cfg, buf[:, -nfs_top:])).astype(wdtype)
        x = dense_apply(tier["input_expand"], prev)
        c, _ = conditioner_apply(tier["conditioner"], cfg,
                                 cond_j[:, None, :].astype(wdtype))
        x = x + c[:, 0, :] + spk_vec
        y, h_new = rnn_cell(cfg, tier["gru"], x, hs[top])
        hs = tuple(h_new if i == top else h for i, h in enumerate(hs))
        slots = upsample_step(tier["upsample"], y)
        if below is not None:
            (buf, hs, key), ys = jax.lax.scan(
                below, (buf, hs, key), jnp.swapaxes(slots, 0, 1))
        else:
            def step(carry2, slot):
                buf2, hs2, key2 = carry2
                key2, sub = jax.random.split(key2)
                s = _mlp_sample(params, fused, buf2, slot, sub, temperature)
                buf2 = jnp.concatenate([buf2[:, 1:], s[:, None]], axis=1)
                return (buf2, hs2, key2), s
            (buf, hs, key), ys = jax.lax.scan(
                step, (buf, hs, key), jnp.swapaxes(slots, 0, 1))
        samples = jnp.moveaxis(ys, 0, 1).reshape(ys.shape[1], nfs_top)
        return (buf, hs, key), samples

    def init_state(batch, spk, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        if jnp.issubdtype(jnp.asarray(spk).dtype, jnp.integer):
            spk_embed = tier["spk_embedding"][jnp.asarray(spk)]
        else:
            spk_embed = jnp.einsum(
                "bs,se->be",
                jnp.asarray(spk).astype(tier["spk_embedding"].dtype),
                tier["spk_embedding"])
        spk_vec = dense_apply(tier["spk_expand"], spk_embed)
        buf = jnp.full((batch, cfg.lookback), q_zero(cfg.q_levels),
                       jnp.int32)
        hs = tuple(
            jnp.broadcast_to(p_t["h0"][:, None, :],
                             (cfg.n_rnn, batch, cfg.dim))
            for p_t in params["tiers"])
        return (spk_vec, buf, hs, key)

    @jax.jit
    def push(carry, cond):
        spk_vec, buf, hs, key = carry
        if frames_per_push == 1:
            (buf, hs, key), samples = frame_step(spk_vec, (buf, hs, key),
                                                 cond)
        else:
            (buf, hs, key), frames = jax.lax.scan(
                partial(frame_step, spk_vec), (buf, hs, key),
                jnp.swapaxes(cond, 0, 1))          # (K, B, nfs_top)
            samples = jnp.moveaxis(frames, 0, 1).reshape(
                frames.shape[1], -1)
        return (spk_vec, buf, hs, key), dequantize(cfg, samples), samples

    return init_state, push


def streaming_fn_dynamic(cfg: ModelConfig, compute_dtype=None,
                         use_pallas=False, pallas_opts=None,
                         frames_per_push=1, temperature=1.0):
    """streaming_fn with params as a CALL argument.

    streaming_fn bakes the weights into the jitted push as constants; at
    flagship size that serializes to a ~350 MB executable per (B, K)
    bucket — heavy on the compile cache, and enough buckets can exhaust
    a backend's loaded-program arena. Here the jitted push takes
    (params, carry, cond), so the executable is small, one compile
    serves changing weights (same cache-key-on-shapes property as
    generate_fn_dynamic), and the weight prep (cast, weight-norm fold,
    fused embed table) is traced into the graph where XLA folds what it
    can. Sample-exact vs streaming_fn for the same key.

    Returns (init_state, push):
      init_state(params, batch, spk, [key]) -> carry
      push(params, carry, cond) -> (carry, audio, samples)
    """
    _check_temperature(temperature)

    def _build(params):
        return streaming_fn(params, cfg, compute_dtype, use_pallas,
                            pallas_opts, frames_per_push, temperature)

    @jax.jit
    def push(params, carry, cond):
        # the inner jitted push inlines into this trace; params are
        # tracers, so nothing is constant-folded into the executable
        return _build(params)[1](carry, cond)

    @partial(jax.jit, static_argnums=(1,))
    def init_state(params, batch, spk, key=None):
        return _build(params)[0](batch, spk, key)

    return init_state, push


def generate_fn_dynamic(cfg: ModelConfig, compute_dtype=None,
                        use_pallas=False, pallas_opts=None, unroll=1,
                        temperature=1.0):
    """generate_fn with params as a CALL argument: one XLA compile serves
    changing weights. generate_fn bakes params into the jitted closure as
    constants — fine for fixed weights, but a per-epoch sampling plugin
    rebuilding it would pay the full nested-scan compile every epoch."""
    @jax.jit
    def generate(params, cond, spk, key):
        # the inner jitted fn inlines into this trace; params are tracers,
        # so nothing is constant-folded and the compile is reused across
        # param values (cache keys on shapes/dtypes only)
        return generate_fn(params, cfg, compute_dtype, use_pallas,
                           pallas_opts, unroll, temperature)(cond, spk, key)
    return generate


def teacher_forced_log_probs(params, cfg: ModelConfig):
    """Jitted f(cond, spk, forced_seq) -> (B, T, q) log-probs, where the
    generation machinery is driven by `forced_seq` instead of sampling.
    Equivalence gate: must equal predictor_apply on
    [q_zero*lookback ‖ forced_seq] with reset=True."""
    top = cfg.n_tiers - 1
    tier = params["tiers"][top]
    nfs_top = cfg.ns_frame_samples[top]
    fused = fused_embed_conv(params["mlp"])
    below = (_make_level_forced(params, cfg, top - 1, fused)
             if top > 0 else None)

    def frame_step(spk_vec, carry, xs):
        cond_j, forced = xs               # (B, C), (B, nfs_top)
        buf, hs = carry
        prev = 2.0 * dequantize(cfg, buf[:, -nfs_top:])
        x = dense_apply(tier["input_expand"], prev)
        c, _ = conditioner_apply(tier["conditioner"], cfg, cond_j[:, None, :])
        x = x + c[:, 0, :] + spk_vec
        y, h_new = rnn_cell(cfg, tier["gru"], x, hs[top])
        hs = tuple(h_new if i == top else h for i, h in enumerate(hs))
        slots = upsample_step(tier["upsample"], y)
        fs = cfg.frame_sizes[top]
        forced_slots = jnp.moveaxis(
            forced.reshape(forced.shape[0], fs, nfs_top // fs), 1, 0)
        if below is None:
            forced_slots = forced_slots[..., 0]

            def step(carry2, xs2):
                slot, fseq = xs2
                buf2, hs2 = carry2
                lp = _mlp_log_probs(params, fused, buf2, slot)
                buf2 = jnp.concatenate([buf2[:, 1:], fseq[:, None]], axis=1)
                return (buf2, hs2), lp
        else:
            step = below
        (buf, hs), lps = jax.lax.scan(
            step, (buf, hs), (jnp.swapaxes(slots, 0, 1), forced_slots))
        q = lps.shape[-1]
        out = jnp.moveaxis(lps, 0, 1).reshape(lps.shape[1], nfs_top, q)
        return (buf, hs), out

    @jax.jit
    def run(cond, spk, forced_seq):
        batch = cond.shape[0]
        spk_embed = tier["spk_embedding"][spk]
        spk_vec = dense_apply(tier["spk_expand"], spk_embed)
        buf = jnp.full((batch, cfg.lookback), q_zero(cfg.q_levels),
                       jnp.int32)
        hs = tuple(
            jnp.broadcast_to(p_t["h0"][:, None, :],
                             (cfg.n_rnn, batch, cfg.dim))
            for p_t in params["tiers"])
        cond_t = jnp.swapaxes(cond, 0, 1)
        forced_t = jnp.moveaxis(
            forced_seq.reshape(batch, -1, nfs_top), 1, 0)
        (_, _), lps = jax.lax.scan(partial(frame_step, spk_vec), (buf, hs),
                                   (cond_t, forced_t))
        q = lps.shape[-1]
        return jnp.moveaxis(lps, 0, 1).reshape(batch, -1, q)

    return run


def generate_fn(params, cfg: ModelConfig, compute_dtype=None,
                use_pallas=False, pallas_opts=None, unroll=1,
                temperature=1.0):
    """Build a jitted generate(cond, spk, key) -> (audio, sequences).

    cond: (B, num_frames, effective_cond_dim) normalized conditioners.
    spk:  (B,) int32 speaker ids.
    compute_dtype: cast float params (and activations) once, e.g.
      jnp.bfloat16 for the production TPU path — matmuls run bf16, the final
      logits/softmax/sampling stay f32.
    use_pallas: fuse the sample-level inner loop into the Pallas window
      kernel (TPU; pallas_opts={"interpret": True} runs it on CPU for
      tests). Requires n_tiers >= 2. Sampling uses the kernel PRNG (same
      distribution, different stream than the XLA path).
    temperature: static logits scale. 1.0 = reference multinomial
      semantics; 0.0 = greedy argmax (XLA path only); <1.0 sharpens (the
      standard mitigation for the thesis's saturation bursts, doc §4.3).
    Returns (float32 audio (B, num_frames*lookback), int32 sample levels).
    """
    _check_temperature(temperature)
    if compute_dtype is not None:
        params = cast_float_tree(params, compute_dtype)
    if use_pallas:
        assert cfg.n_tiers >= 2, "pallas path needs a frame tier above MLP"
        pallas_opts = dict(pallas_opts or {})
    else:
        pallas_opts = None
    top = cfg.n_tiers - 1
    tier = params["tiers"][top]
    nfs_top = cfg.ns_frame_samples[top]
    fused = fused_embed_conv(params["mlp"])
    below = (_make_level(params, cfg, top - 1, fused, pallas_opts, unroll,
                         temperature)
             if top > 0 else None)
    wdtype = tier["input_expand"]["w"].dtype

    def frame_step(spk_vec, carry, cond_j):
        buf, hs, key = carry
        prev = (2.0 * dequantize(cfg, buf[:, -nfs_top:])).astype(wdtype)
        x = dense_apply(tier["input_expand"], prev)
        c, _latent = conditioner_apply(tier["conditioner"], cfg,
                                       cond_j[:, None, :].astype(wdtype))
        x = x + c[:, 0, :] + spk_vec
        y, h_new = rnn_cell(cfg, tier["gru"], x, hs[top])
        hs = tuple(h_new if i == top else h for i, h in enumerate(hs))
        slots = upsample_step(tier["upsample"], y)        # (B, fs_top, dim)
        if below is not None:
            step = below
        else:
            def step(carry2, slot):
                buf2, hs2, key2 = carry2
                key2, sub = jax.random.split(key2)
                s = _mlp_sample(params, fused, buf2, slot, sub, temperature)
                buf2 = jnp.concatenate([buf2[:, 1:], s[:, None]], axis=1)
                return (buf2, hs2, key2), s
        (buf, hs, key), ys = jax.lax.scan(
            step, (buf, hs, key), jnp.swapaxes(slots, 0, 1))
        samples = jnp.moveaxis(ys, 0, 1).reshape(ys.shape[1], nfs_top)
        return (buf, hs, key), samples

    @jax.jit
    def generate(cond, spk, key):
        batch = cond.shape[0]
        if jnp.issubdtype(spk.dtype, jnp.integer):
            spk_embed = tier["spk_embedding"][spk]
        else:
            # eigen-voice / speaker interpolation (thesis §3.3): float spk of
            # shape (B, spk_dim) mixes speaker embeddings — new voices from
            # convex combinations of trained speakers
            spk_embed = jnp.einsum(
                "bs,se->be", spk.astype(tier["spk_embedding"].dtype),
                tier["spk_embedding"])
        spk_vec = dense_apply(tier["spk_expand"], spk_embed)
        # seed lookback samples of q_zero (ref model.py:459)
        buf = jnp.full((batch, cfg.lookback), q_zero(cfg.q_levels),
                       jnp.int32)
        # fresh hidden = learned h0 (reset semantics, ref model.py:451)
        hs = tuple(
            jnp.broadcast_to(p_t["h0"][:, None, :],
                             (cfg.n_rnn, batch, cfg.dim))
            for p_t in params["tiers"])
        carry = (buf, hs, key)
        cond_t = jnp.swapaxes(cond, 0, 1)                 # (frames, B, C)
        carry, frames = jax.lax.scan(partial(frame_step, spk_vec), carry,
                                     cond_t)
        seq = jnp.moveaxis(frames, 0, 1).reshape(batch, -1)
        return dequantize(cfg, seq), seq

    return generate
