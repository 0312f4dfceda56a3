"""Helpers to run the actual reference implementation (read-only import
from /root/reference) for parity tests.

The reference's speaker-embedding debug dump (ref model.py:209-214) crashes
for batch > 1 on any torch version (`spk.reshape(1)` on a (B,1) tensor), so
we import a copy with ONLY those 6 debug lines excised. nn.py / utils.py /
optim.py import unmodified.
"""

import os
import sys

_PATCH_DIR = "/tmp/msnv_refpatch"


def import_reference_model():
    os.makedirs(_PATCH_DIR, exist_ok=True)
    src = open("/root/reference/model.py").read()
    lines = src.splitlines(keepends=True)
    patched = "".join(lines[:208]) + "".join(lines[214:])
    assert "np.savetxt" not in patched, "debug-dump excision failed"
    with open(os.path.join(_PATCH_DIR, "model.py"), "w") as f:
        f.write(patched)
    # patch dir must come FIRST so the patched model.py shadows the original
    for p in ("/root/reference", _PATCH_DIR):
        if p in sys.path:
            sys.path.remove(p)
        sys.path.insert(0, p)
    sys.modules.pop("model", None)  # force re-import from the patch dir
    import model as ref_model  # noqa: E402
    assert ref_model.__file__.startswith(_PATCH_DIR), ref_model.__file__
    return ref_model


def copy_params_to_torch(params, cfg, torch_model):
    """Copy our parameter pytree into a reference SampleRNN (in place).

    Layout mapping (documented against ref model.py / nn.py):
      input_expand Conv1d (dim, nfs, 1)      <- ours (dim, nfs)
      cond_expand  Conv1d (dim, C, 1)        <- conditioner.expand (dim, C)
      spk_embedding (S, S)                   <- spk_embedding
      spk_expand   Conv1d (dim, S, 1)        <- spk_expand (dim, S)
      GRU weight_ih/hh_l{i} (3H, *)          <- gru[i].w_ih / w_hh
      upsampling.conv_t (in, out, k)         <- upsample.w (in, k, out)
      upsampling.bias (out, k)               <- upsample.bias (k, out)
      mlp input Conv1d (dim, q, fs0)         <- mlp.conv_in (fs0, q, dim)
      mlp hidden/output Conv1d k=1           <- mlp.hidden / mlp.out
    """
    import numpy as np
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    with torch.no_grad():
        for i, rnn in enumerate(torch_model.frame_level_rnns):
            tier = params["tiers"][i]
            rnn.h0.copy_(t(tier["h0"]))
            rnn.input_expand.weight.copy_(
                t(tier["input_expand"]["w"])[:, :, None])
            rnn.input_expand.bias.copy_(t(tier["input_expand"]["b"]))
            if rnn.cond_expand is not None:
                exp = tier["conditioner"]["expand"]
                rnn.cond_expand.weight.copy_(t(exp["w"])[:, :, None])
                rnn.cond_expand.bias.copy_(t(exp["b"]))
                rnn.spk_embedding.weight.copy_(t(tier["spk_embedding"]))
                rnn.spk_expand.weight.copy_(
                    t(tier["spk_expand"]["w"])[:, :, None])
                rnn.spk_expand.bias.copy_(t(tier["spk_expand"]["b"]))
            for l, layer in enumerate(tier["gru"]):
                getattr(rnn.rnn, f"weight_ih_l{l}").copy_(t(layer["w_ih"]))
                getattr(rnn.rnn, f"weight_hh_l{l}").copy_(t(layer["w_hh"]))
                getattr(rnn.rnn, f"bias_ih_l{l}").copy_(t(layer["b_ih"]))
                getattr(rnn.rnn, f"bias_hh_l{l}").copy_(t(layer["b_hh"]))
            up = tier["upsample"]
            w_t = t(up["w"]).permute(0, 2, 1).contiguous()  # (in, out, k)
            conv_t = rnn.upsampling.conv_t
            if hasattr(conv_t, "weight_v"):
                # Reference bug (ref model.py:177): `if weight_norm:` tests
                # the imported FUNCTION, not the flag, so the upsampler is
                # ALWAYS weight-norm-wrapped. Write v and g so the effective
                # weight equals ours (g = per-in-channel norm of w).
                conv_t.weight_v.copy_(w_t)
                conv_t.weight_g.copy_(
                    w_t.norm(dim=(1, 2), keepdim=True))
            else:
                conv_t.weight.copy_(w_t)
            rnn.upsampling.bias.copy_(t(up["bias"]).T.contiguous())

        mlp = params["mlp"]
        tm = torch_model.sample_level_mlp
        tm.embedding.weight.copy_(t(mlp["embedding"]))
        tm.input.weight.copy_(t(mlp["conv_in"]).permute(2, 1, 0).contiguous())
        tm.hidden.weight.copy_(t(mlp["hidden"]["w"])[:, :, None])
        tm.hidden.bias.copy_(t(mlp["hidden"]["b"]))
        tm.output.weight.copy_(t(mlp["out"]["w"])[:, :, None])
        tm.output.bias.copy_(t(mlp["out"]["b"]))
