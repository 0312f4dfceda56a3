"""AOT serving artifacts: serialized generation executables (jax.export).

The serving cold-start cost of the flagship generation graph is dominated
by Python tracing + lowering (~70 s of the ~111 s cold compile measured in
docs/DESIGN.md "Compile latency"); the persistent JIT cache only helps the
machine that already compiled. An exported artifact moves that work to
build time: `msnv-export` serializes the lowered StableHLO module(s) for a
fixed set of (lanes, frames) buckets into one self-describing file, and a
server (or any process) loads and runs them without retracing — and
without the model-building Python on the deploy side at all.

Params stay CALL-TIME arguments (not baked constants), so one artifact
serves any weights with the same shapes — fine-tuned checkpoints
included. PRNG keys cross the artifact ABI as raw uint32 key data
(`jax.random.key_data`), re-wrapped inside.

Artifact layout (single file):

    MAGIC 'MSNVEXP1' | u32 manifest_len | manifest JSON (UTF-8)
    | concatenated serialized jax.export.Exported blobs

The manifest records the experiment tag (the reference's config store,
ref generate.py:126-129), engine options, platforms, and per-bucket blob
offsets. No reference counterpart: the reference rebuilds the torch model
from source per generated file (ref generate.py:207-235).
"""

from __future__ import annotations

import dataclasses
import json
import struct
from typing import Optional, Sequence

MAGIC = b"MSNVEXP1"


# --------------------------------------------------------------------------
# Export (build side)
# --------------------------------------------------------------------------

def _gen_callable(cfg, temperature, use_pallas, compute_dtype):
    """generate(params, cond, spk, key_data) with a uint32-key ABI."""
    import jax
    from msnv_tpu.models.generate import generate_fn_dynamic

    gen = generate_fn_dynamic(cfg, compute_dtype=compute_dtype,
                              use_pallas=use_pallas,
                              temperature=temperature)

    def call(params, cond, spk, key_data):
        audio, sequences = gen(params, cond, spk,
                               jax.random.wrap_key_data(key_data))
        return audio, sequences

    return call


def _key_data_aval():
    import jax
    import jax.numpy as jnp
    data = jax.random.key_data(jax.random.PRNGKey(0))
    return jax.ShapeDtypeStruct(data.shape, jnp.uint32)


def _stream_callables(cfg, temperature, frames_per_push, compute_dtype):
    """(init, push) with params as CALL arguments and a raw-uint32 PRNG
    key in the carry ABI (typed key arrays don't cross jax.export).

    init(params, spk, key_data) -> carry
    push(params, carry, cond)   -> (carry, audio, samples)

    cond is (lanes, C) for frames_per_push == 1 else (lanes, K, C) — the
    exact serving push convention (serving.VocoderService.stream).
    """
    import jax
    from msnv_tpu.models.generate import streaming_fn

    def build(params):
        return streaming_fn(params, cfg, compute_dtype=compute_dtype,
                            frames_per_push=frames_per_push,
                            temperature=temperature)

    def init(params, spk, key_data):
        init_state, _ = build(params)
        carry = init_state(spk.shape[0], spk,
                           jax.random.wrap_key_data(key_data))
        spk_vec, buf, hs, key = carry
        return spk_vec, buf, hs, jax.random.key_data(key)

    def push(params, carry, cond):
        _, push_fn = build(params)
        spk_vec, buf, hs, key_data = carry
        (spk_vec, buf, hs, key), audio, samples = push_fn(
            (spk_vec, buf, hs, jax.random.wrap_key_data(key_data)), cond)
        return (spk_vec, buf, hs, jax.random.key_data(key)), audio, samples

    return init, push


def export_streaming(params, cfg, lanes: int, frames_per_push: int, *,
                     temperature: float = 1.0, compute_dtype=None,
                     spk_mix: bool = False,
                     platforms: Optional[Sequence[str]] = None):
    """Serialize one streaming bucket -> (init_blob, push_blob).

    The push executable IS the /stream hot path: exporting it means a
    server with a cold compile cache streams first audio right after
    artifact load instead of paying the live-jit trace+compile (the gap
    export.py's round-1 notes called out; reference analogue: generation
    availability right after checkpoint load, ref generate.py:207-235).
    """
    import jax
    import jax.numpy as jnp

    init, push = _stream_callables(cfg, temperature, frames_per_push,
                                   compute_dtype)
    p_avals = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        params)
    spk_aval = (jax.ShapeDtypeStruct((lanes, cfg.spk_dim), jnp.float32)
                if spk_mix else jax.ShapeDtypeStruct((lanes,), jnp.int32))
    plats = list(platforms) if platforms else None
    init_exp = jax.export.export(jax.jit(init), platforms=plats)(
        p_avals, spk_aval, _key_data_aval())
    # the carry ABI comes from tracing init itself
    carry_avals = jax.eval_shape(init, p_avals, spk_aval, _key_data_aval())
    cond_shape = ((lanes, cfg.effective_cond_dim) if frames_per_push == 1
                  else (lanes, frames_per_push, cfg.effective_cond_dim))
    cond_aval = jax.ShapeDtypeStruct(cond_shape, jnp.float32)
    push_exp = jax.export.export(jax.jit(push), platforms=plats)(
        p_avals, carry_avals, cond_aval)
    return init_exp.serialize(), push_exp.serialize()


def export_generation(params, cfg, lanes: int, n_frames: int, *,
                      temperature: float = 1.0, use_pallas: bool = False,
                      compute_dtype=None, spk_mix: bool = False,
                      platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize one (lanes, frames) generation executable.

    spk_mix=True exports the float speaker-mixing ABI (spk is
    (lanes, spk_dim) embedding weights — eigen-voice generation) instead
    of int32 speaker ids.
    """
    import jax
    import jax.numpy as jnp

    call = _gen_callable(cfg, temperature, use_pallas, compute_dtype)
    p_avals = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        params)
    cond_aval = jax.ShapeDtypeStruct(
        (lanes, n_frames, cfg.effective_cond_dim), jnp.float32)
    spk_aval = (jax.ShapeDtypeStruct((lanes, cfg.spk_dim), jnp.float32)
                if spk_mix else jax.ShapeDtypeStruct((lanes,), jnp.int32))
    exp = jax.export.export(
        jax.jit(call),
        platforms=list(platforms) if platforms else None,
    )(p_avals, cond_aval, spk_aval, _key_data_aval())
    return exp.serialize()


def save_artifact(path: str, cfg, buckets, *, temperature: float = 1.0,
                  use_pallas: bool = False, compute_dtype=None,
                  spk_mix: bool = False,
                  platforms: Optional[Sequence[str]] = None,
                  params=None, stream_buckets=None,
                  extra_meta: Optional[dict] = None) -> dict:
    """Export every (lanes, n_frames) in `buckets` — plus every
    (lanes, frames_per_push) in `stream_buckets` as init+push streaming
    executables — and write one artifact.

    Returns the manifest. `params` must be supplied (shapes define the
    executable ABI); cfg may be a ModelConfig or a full ExperimentConfig.
    """
    import jax
    from msnv_tpu.config import ExperimentConfig, make_tag

    if params is None:
        raise ValueError("save_artifact needs params (their shapes are "
                         "part of the executable ABI)")
    model_cfg = cfg.model if hasattr(cfg, "model") else cfg
    tag = make_tag(cfg) if isinstance(cfg, ExperimentConfig) else None

    blobs, entries = [], []
    offset = 0
    for lanes, n_frames in buckets:
        blob = export_generation(
            params, model_cfg, lanes, n_frames, temperature=temperature,
            use_pallas=use_pallas, compute_dtype=compute_dtype,
            spk_mix=spk_mix, platforms=platforms)
        entries.append({"lanes": int(lanes), "frames": int(n_frames),
                        "offset": offset, "size": len(blob)})
        blobs.append(blob)
        offset += len(blob)

    stream_entries = []
    for lanes, k in (stream_buckets or []):
        init_blob, push_blob = export_streaming(
            params, model_cfg, lanes, k, temperature=temperature,
            compute_dtype=compute_dtype, spk_mix=spk_mix,
            platforms=platforms)
        stream_entries.append({
            "lanes": int(lanes), "frames_per_push": int(k),
            "init_offset": offset, "init_size": len(init_blob),
            "push_offset": offset + len(init_blob),
            "push_size": len(push_blob)})
        blobs.extend([init_blob, push_blob])
        offset += len(init_blob) + len(push_blob)

    manifest = {
        "tag": tag,
        "model": dataclasses.asdict(model_cfg),
        "temperature": float(temperature),
        "engine": "pallas" if use_pallas else "xla",
        "compute_dtype": (str(compute_dtype.__name__)
                          if compute_dtype is not None else None),
        "spk_mix": bool(spk_mix),
        "platforms": (list(platforms) if platforms
                      else [jax.default_backend()]),
        "jax_version": jax.__version__,
        "samples_per_frame": model_cfg.lookback,
        "buckets": entries,
        "streams": stream_entries,
    }
    if extra_meta:
        manifest.update(extra_meta)
    mbytes = json.dumps(manifest).encode("utf-8")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(mbytes)))
        f.write(mbytes)
        for blob in blobs:
            f.write(blob)
    return manifest


# --------------------------------------------------------------------------
# Load (deploy side)
# --------------------------------------------------------------------------

class GenerationArtifact:
    """Loaded artifact: bucketed AOT generation executables.

    call(params, cond, spk, key) picks the exact (lanes, frames) bucket;
    callers pad to a bucket shape themselves (serving already buckets by
    power-of-two lanes and frame_bucket multiples).
    """

    def __init__(self, manifest: dict, exported: dict, streams=None):
        self.manifest = manifest
        self._exported = exported   # (lanes, frames) -> jax.export.Exported
        self._streams = streams or {}  # (lanes, K) -> (init_exp, push_exp)

    @property
    def buckets(self):
        return sorted(self._exported)

    @property
    def stream_buckets(self):
        return sorted(self._streams)

    def has_bucket(self, lanes: int, n_frames: int) -> bool:
        return (int(lanes), int(n_frames)) in self._exported

    def has_stream(self, lanes: int, frames_per_push: int) -> bool:
        return (int(lanes), int(frames_per_push)) in self._streams

    @staticmethod
    def _key_data(key):
        import jax
        if hasattr(key, "dtype") and key.dtype == "uint32":
            return key
        return jax.random.key_data(key)

    def call(self, params, cond, spk, key):
        lanes, n_frames = int(cond.shape[0]), int(cond.shape[1])
        exp = self._exported.get((lanes, n_frames))
        if exp is None:
            raise KeyError(
                f"no bucket for (lanes={lanes}, frames={n_frames}); "
                f"artifact has {self.buckets}")
        return exp.call(params, cond, spk, self._key_data(key))

    def streaming(self, frames_per_push: int, lanes: int = 1):
        """(init_state, push) over the exported streaming executables,
        signature-compatible with models/generate.streaming_fn — the
        carry is an opaque pytree valid for THIS bucket only (the raw
        PRNG key-data rides inside it)."""
        exps = self._streams.get((int(lanes), int(frames_per_push)))
        if exps is None:
            raise KeyError(
                f"no stream bucket (lanes={lanes}, "
                f"frames_per_push={frames_per_push}); artifact has "
                f"{self.stream_buckets}")
        init_exp, push_exp = exps

        def init_state(params, spk, key):
            return init_exp.call(params, spk, self._key_data(key))

        def push(params, carry, cond):
            return push_exp.call(params, carry, cond)

        return init_state, push


def load_artifact(path: str) -> GenerationArtifact:
    import jax

    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path}: not an msnv export artifact "
                             f"(magic {magic!r})")
        (mlen,) = struct.unpack("<I", f.read(4))
        manifest = json.loads(f.read(mlen).decode("utf-8"))
        body = f.read()
    exported = {}
    for ent in manifest["buckets"]:
        blob = body[ent["offset"]:ent["offset"] + ent["size"]]
        exported[(ent["lanes"], ent["frames"])] = jax.export.deserialize(
            bytearray(blob))
    streams = {}
    for ent in manifest.get("streams", []):
        init_exp = jax.export.deserialize(bytearray(
            body[ent["init_offset"]:ent["init_offset"] + ent["init_size"]]))
        push_exp = jax.export.deserialize(bytearray(
            body[ent["push_offset"]:ent["push_offset"] + ent["push_size"]]))
        streams[(ent["lanes"], ent["frames_per_push"])] = (init_exp,
                                                           push_exp)
    return GenerationArtifact(manifest, exported, streams)
