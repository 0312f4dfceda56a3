"""Checkpoint interop (msnv_tpu/interop.py + cli/interop.py): reference
torch checkpoints round-trip into our pytree and back, verified against
the ACTUAL reference model's state_dict."""

import os

import numpy as np
import pytest

import jax

from msnv_tpu.config import ModelConfig, ExperimentConfig, make_tag
from msnv_tpu.interop import (params_from_reference_state_dict,
                              reference_state_dict_from_params)
from msnv_tpu.models.samplernn import init_params

torch = pytest.importorskip("torch")

from ref_compat import copy_params_to_torch, import_reference_model

CFG = ModelConfig(frame_sizes=(4, 4), n_rnn=2, dim=16, cond_dim=5,
                  spk_dim=3)


def _tree_allclose(a, b, atol=1e-6):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): x
          for p, x in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for p, x in la:
        np.testing.assert_allclose(np.asarray(x), np.asarray(lb[jax.tree_util.keystr(p)]),
                                   atol=atol, err_msg=jax.tree_util.keystr(p))


def test_import_from_actual_reference_state_dict():
    """params -> (parity-verified) torch model -> state_dict -> import
    must reproduce the original pytree."""
    ref_model = import_reference_model()
    tm = ref_model.SampleRNN(
        frame_sizes=list(CFG.frame_sizes), n_rnn=CFG.n_rnn, dim=CFG.dim,
        learn_h0=True, q_levels=CFG.q_levels, ulaw=CFG.ulaw,
        weight_norm=False, cond_dim=CFG.effective_cond_dim,
        spk_dim=CFG.spk_dim, qrnn=False)
    params = init_params(jax.random.PRNGKey(0), CFG)
    copy_params_to_torch(params, CFG, tm)
    back = params_from_reference_state_dict(tm.state_dict(), CFG)
    _tree_allclose(params, back)


def test_export_loads_into_actual_reference_model():
    """Exported state_dict must load strict into the reference Predictor
    and match a fresh export byte-for-byte after the round trip."""
    ref_model = import_reference_model()
    params = init_params(jax.random.PRNGKey(1), CFG)
    sd = reference_state_dict_from_params(params, CFG)
    tm = ref_model.SampleRNN(
        frame_sizes=list(CFG.frame_sizes), n_rnn=CFG.n_rnn, dim=CFG.dim,
        learn_h0=True, q_levels=CFG.q_levels, ulaw=CFG.ulaw,
        weight_norm=False, cond_dim=CFG.effective_cond_dim,
        spk_dim=CFG.spk_dim, qrnn=False)
    predictor = ref_model.Predictor(tm)
    predictor.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()})  # strict=True
    back = params_from_reference_state_dict(predictor.state_dict(), CFG)
    _tree_allclose(params, back)


def test_import_rejects_wrong_config():
    params = init_params(jax.random.PRNGKey(0), CFG)
    sd = reference_state_dict_from_params(params, CFG)
    wrong = ModelConfig(frame_sizes=(4, 4, 4), n_rnn=2, dim=16,
                        cond_dim=5, spk_dim=3)
    with pytest.raises(KeyError):
        params_from_reference_state_dict(sd, wrong)
    with pytest.raises(ValueError):
        params_from_reference_state_dict(
            sd, ModelConfig(frame_sizes=(4, 4), weight_norm=True,
                            cond_dim=5, spk_dim=3, n_rnn=2, dim=16))


def test_interop_cli_roundtrip(tmp_path):
    """import CLI: torch.save'd reference checkpoint under the reference
    results/<tag>/checkpoints layout -> npz; export CLI back -> equal."""
    from msnv_tpu.cli.interop import main as interop_main
    from msnv_tpu.training.checkpoint import load_any

    cfg = ExperimentConfig(exp="samplernn", model=CFG)
    tag = make_tag(cfg)
    ckpt_dir = tmp_path / "results" / tag / "checkpoints"
    ckpt_dir.mkdir(parents=True)

    params = init_params(jax.random.PRNGKey(2), CFG)
    sd = reference_state_dict_from_params(params, CFG)
    torch_path = str(ckpt_dir / "best-ep3-it99")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, torch_path)

    assert interop_main(["import", "--torch_ckpt", torch_path]) == 0
    npz_path = torch_path + ".npz"
    state, meta = load_any(npz_path, {"params": params})
    assert meta["tag"] == tag
    _tree_allclose(params, state["params"])

    assert interop_main(["export", "--model", npz_path,
                         "--out", str(tmp_path / "back.pt")]) == 0
    sd2 = torch.load(str(tmp_path / "back.pt"), map_location="cpu",
                     weights_only=True)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_allclose(sd2[k].numpy(), sd[k], atol=1e-6,
                                   err_msg=k)
