"""Checkpoint interop with the reference PyTorch implementation.

Lets a reference user bring their trained checkpoints here (and go back):

- `params_from_reference_state_dict(sd, cfg)` — reference
  `torch.save(model.state_dict(), ...)` checkpoint (ref
  trainer/plugins.py:130-136; the state_dict is of the Predictor-wrapped
  SampleRNN, key prefix `model.`) -> our parameter pytree.
- `reference_state_dict_from_params(params, cfg)` — our pytree -> a
  reference-layout state_dict (numpy arrays; torch.save-able).

The tensor-layout mapping is the same one the parity tests verify
numerically in tests/ref_compat.py (log-probs allclose 5e-5 with weights
copied across):

  reference (torch)                         ours
  frame_level_rnns.{t}.h0                   tiers[t].h0            (same)
  .input_expand Conv1d w (dim, nfs, 1)      .input_expand.w (dim, nfs)
  .cond_expand  Conv1d w (dim, C, 1)        .conditioner.expand.w (dim, C)
  .spk_embedding.weight (S, S)              .spk_embedding         (same)
  .spk_expand   Conv1d w (dim, S, 1)        .spk_expand.w (dim, S)
  .rnn.weight_ih_l{l} / bias_* (3H, *)      .gru[l].w_ih / b_*     (same)
  .upsampling.conv_t w (in, out, k)         .upsample.w (in, k, out)
  .upsampling.bias (out, k)                 .upsample.bias (k, out)
  sample_level_mlp.embedding.weight         mlp.embedding          (same)
  .input Conv1d w (dim, q, fs0)             mlp.conv_in (fs0, q, dim)
  .hidden / .output Conv1d k=1              mlp.hidden / mlp.out

Weight-norm handling: a torch conv saved under weight_norm stores
`weight_v`/`weight_g` instead of `weight`; the import reconstructs the
effective weight (dim-0 norm convention). The reference's upsampler is
ALWAYS weight-norm-wrapped regardless of the flag (ref model.py:177 bug:
`if weight_norm:` tests the imported function), so the export always
writes v/g for it.

Variant scope: the canonical "identity" conditioner head (the
samplernn-gan / bottle-neck heads live on branches of the original repo
with different module layouts).
"""

from __future__ import annotations

import numpy as np

from msnv_tpu.config import ModelConfig


def _norm0(v: np.ndarray) -> np.ndarray:
    """Per-dim-0 L2 norm, keepdims (torch weight_norm dim=0 convention)."""
    return np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(axis=1)).reshape(
        (v.shape[0],) + (1,) * (v.ndim - 1))


def _conv_weight(sd: dict, prefix: str) -> np.ndarray:
    """Effective conv weight, whether saved plain or weight-normed."""
    if prefix + ".weight" in sd:
        return np.asarray(sd[prefix + ".weight"])
    v = np.asarray(sd[prefix + ".weight_v"])
    g = np.asarray(sd[prefix + ".weight_g"]).reshape(_norm0(v).shape)
    return v * (g / _norm0(v))


def _strip_model_prefix(sd: dict) -> dict:
    """The reference saves the Predictor's state_dict, so every key is
    prefixed `model.` (ref train.py:272, plugins.py:130-136); accept both
    bare-SampleRNN and Predictor-wrapped dicts."""
    if any(k.startswith("model.") for k in sd):
        return {k[len("model."):]: v for k, v in sd.items()
                if k.startswith("model.")}
    return sd


def params_from_reference_state_dict(sd: dict, cfg: ModelConfig):
    """Reference state_dict (numpy or torch tensors) -> our params pytree.

    Raises KeyError naming the first missing reference key (wrong
    frame_sizes/n_rnn/variant for this checkpoint).
    """
    if cfg.variant != "identity":
        raise ValueError("interop supports the canonical 'identity' head; "
                         "gan/bottleneck reference variants live on "
                         "branches with different module layouts")
    if cfg.weight_norm:
        raise ValueError("import with weight_norm=false: weight-normed "
                         "reference checkpoints are reconstructed as "
                         "effective weights (numerically identical "
                         "forward)")
    sd = _strip_model_prefix(
        {k: _to_numpy(v).astype(np.float32) for k, v in sd.items()})

    import jax.numpy as jnp

    def arr(x):
        return jnp.asarray(np.asarray(x, np.float32))

    tiers = []
    for t in range(cfg.n_tiers):
        p = f"frame_level_rnns.{t}"
        tier = {
            "h0": arr(sd[f"{p}.h0"]),
            "input_expand": {
                "w": arr(_conv_weight(sd, f"{p}.input_expand")[:, :, 0]),
                "b": arr(sd[f"{p}.input_expand.bias"]),
            },
            "gru": [
                {"w_ih": arr(sd[f"{p}.rnn.weight_ih_l{l}"]),
                 "w_hh": arr(sd[f"{p}.rnn.weight_hh_l{l}"]),
                 "b_ih": arr(sd[f"{p}.rnn.bias_ih_l{l}"]),
                 "b_hh": arr(sd[f"{p}.rnn.bias_hh_l{l}"])}
                for l in range(cfg.n_rnn)],
            "upsample": {
                # torch ConvTranspose1d (in, out, k) -> ours (in, k, out)
                "w": arr(np.transpose(
                    _conv_weight(sd, f"{p}.upsampling.conv_t"),
                    (0, 2, 1))),
                # torch learned bias (out, k) -> ours (k, out)
                "bias": arr(sd[f"{p}.upsampling.bias"].T),
            },
        }
        if t == cfg.n_tiers - 1:   # top tier is the conditioned one
            tier["conditioner"] = {"expand": {
                "w": arr(_conv_weight(sd, f"{p}.cond_expand")[:, :, 0]),
                "b": arr(sd[f"{p}.cond_expand.bias"]),
            }}
            tier["spk_embedding"] = arr(sd[f"{p}.spk_embedding.weight"])
            tier["spk_expand"] = {
                "w": arr(_conv_weight(sd, f"{p}.spk_expand")[:, :, 0]),
                "b": arr(sd[f"{p}.spk_expand.bias"]),
            }
        tiers.append(tier)

    m = "sample_level_mlp"
    mlp = {
        "embedding": arr(sd[f"{m}.embedding.weight"]),
        # torch Conv1d (dim, q, fs0) -> ours (fs0, q, dim)
        "conv_in": arr(np.transpose(_conv_weight(sd, f"{m}.input"),
                                    (2, 1, 0))),
        "hidden": {"w": arr(_conv_weight(sd, f"{m}.hidden")[:, :, 0]),
                   "b": arr(sd[f"{m}.hidden.bias"])},
        "out": {"w": arr(_conv_weight(sd, f"{m}.output")[:, :, 0]),
                "b": arr(sd[f"{m}.output.bias"])},
    }
    return {"tiers": tiers, "mlp": mlp}


def reference_state_dict_from_params(params, cfg: ModelConfig) -> dict:
    """Our params pytree -> reference-layout state_dict (numpy float32,
    Predictor-wrapped `model.` prefix; pass through torch.save to produce
    a file the reference's load_state_dict accepts)."""
    if cfg.variant != "identity":
        raise ValueError("interop supports the canonical 'identity' head")
    if cfg.weight_norm:
        raise ValueError("export targets weight_norm=False checkpoints "
                         "(the canonical run config)")

    def n(x):
        return np.asarray(x, np.float32)

    sd = {}
    for t, tier in enumerate(params["tiers"]):
        p = f"model.frame_level_rnns.{t}"
        sd[f"{p}.h0"] = n(tier["h0"])
        sd[f"{p}.input_expand.weight"] = n(tier["input_expand"]["w"])[:, :, None]
        sd[f"{p}.input_expand.bias"] = n(tier["input_expand"]["b"])
        if "conditioner" in tier:
            exp = tier["conditioner"]["expand"]
            sd[f"{p}.cond_expand.weight"] = n(exp["w"])[:, :, None]
            sd[f"{p}.cond_expand.bias"] = n(exp["b"])
            sd[f"{p}.spk_embedding.weight"] = n(tier["spk_embedding"])
            sd[f"{p}.spk_expand.weight"] = n(tier["spk_expand"]["w"])[:, :, None]
            sd[f"{p}.spk_expand.bias"] = n(tier["spk_expand"]["b"])
        for l, layer in enumerate(tier["gru"]):
            sd[f"{p}.rnn.weight_ih_l{l}"] = n(layer["w_ih"])
            sd[f"{p}.rnn.weight_hh_l{l}"] = n(layer["w_hh"])
            sd[f"{p}.rnn.bias_ih_l{l}"] = n(layer["b_ih"])
            sd[f"{p}.rnn.bias_hh_l{l}"] = n(layer["b_hh"])
        # (in, k, out) -> (in, out, k); always weight-norm v/g (ref
        # model.py:177 always wraps the upsampler)
        w_t = np.transpose(n(tier["upsample"]["w"]), (0, 2, 1))
        sd[f"{p}.upsampling.conv_t.weight_v"] = w_t
        sd[f"{p}.upsampling.conv_t.weight_g"] = _norm0(w_t)
        sd[f"{p}.upsampling.bias"] = n(tier["upsample"]["bias"]).T
    mlp = params["mlp"]
    m = "model.sample_level_mlp"
    sd[f"{m}.embedding.weight"] = n(mlp["embedding"])
    sd[f"{m}.input.weight"] = np.transpose(n(mlp["conv_in"]), (2, 1, 0))
    sd[f"{m}.hidden.weight"] = n(mlp["hidden"]["w"])[:, :, None]
    sd[f"{m}.hidden.bias"] = n(mlp["hidden"]["b"])
    sd[f"{m}.output.weight"] = n(mlp["out"]["w"])[:, :, None]
    sd[f"{m}.output.bias"] = n(mlp["out"]["b"])
    return sd


def _to_numpy(v):
    """torch tensor / jax array / numpy -> numpy (no torch import needed
    unless the value is a torch tensor)."""
    if isinstance(v, np.ndarray):
        return v
    if hasattr(v, "detach"):          # torch tensor
        return v.detach().cpu().numpy()
    return np.asarray(v)
