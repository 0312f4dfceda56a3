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
                  params=None, extra_meta: Optional[dict] = None) -> dict:
    """Export every (lanes, n_frames) in `buckets` and write one artifact.

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

    def __init__(self, manifest: dict, exported: dict):
        self.manifest = manifest
        self._exported = exported   # (lanes, frames) -> jax.export.Exported

    @property
    def buckets(self):
        return sorted(self._exported)

    def has_bucket(self, lanes: int, n_frames: int) -> bool:
        return (int(lanes), int(n_frames)) in self._exported

    def call(self, params, cond, spk, key):
        import jax
        lanes, n_frames = int(cond.shape[0]), int(cond.shape[1])
        exp = self._exported.get((lanes, n_frames))
        if exp is None:
            raise KeyError(
                f"no bucket for (lanes={lanes}, frames={n_frames}); "
                f"artifact has {self.buckets}")
        if hasattr(key, "dtype") and key.dtype == "uint32":
            key_data = key
        else:
            key_data = jax.random.key_data(key)
        return exp.call(params, cond, spk, key_data)


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
    return GenerationArtifact(manifest, exported)
