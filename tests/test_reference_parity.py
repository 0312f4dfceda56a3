"""THE parity gate: our predictor's log-probs must match the ACTUAL
reference implementation (weights copied across) to float tolerance.

Chain of evidence for generation parity: our generator ==
(teacher-forcing test) == our predictor == (this test) == reference
Predictor, and the reference Generator is by construction the sample-by-
sample unrolling of its Predictor.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msnv_tpu.config import ModelConfig
from msnv_tpu.models.samplernn import (init_params, init_tier_state,
                                       predictor_apply,
                                       sequence_nll_loss_bits)

torch = pytest.importorskip("torch")

from ref_compat import copy_params_to_torch, import_reference_model


def build_pair(cfg: ModelConfig, seed=0):
    ref_model = import_reference_model()
    tm = ref_model.SampleRNN(
        frame_sizes=list(cfg.frame_sizes), n_rnn=cfg.n_rnn, dim=cfg.dim,
        learn_h0=cfg.learn_h0, q_levels=cfg.q_levels, ulaw=cfg.ulaw,
        weight_norm=False, cond_dim=cfg.effective_cond_dim,
        spk_dim=cfg.spk_dim, qrnn=False)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    copy_params_to_torch(params, cfg, tm)
    predictor = ref_model.Predictor(tm)
    return params, predictor


@pytest.mark.parametrize("frame_sizes,n_rnn,dim", [
    ((4, 4), 1, 16),
    ((20, 4), 2, 32),     # canonical shape chain at reduced width
    ((4, 5, 4), 1, 16),   # 3-tier (BASELINE config[1] shape)
])
def test_predictor_log_prob_parity(frame_sizes, n_rnn, dim):
    cfg = ModelConfig(frame_sizes=frame_sizes, n_rnn=n_rnn, dim=dim,
                      cond_dim=11, spk_dim=4)
    params, predictor = build_pair(cfg)

    batch = 3
    seq_len = 2 * cfg.lookback   # two top-tier frames
    rng = np.random.RandomState(1)
    data = rng.randint(0, 256, (batch, seq_len + cfg.lookback - 1))
    cond = rng.rand(batch, seq_len // cfg.lookback,
                    cfg.effective_cond_dim).astype(np.float32)
    spk = rng.randint(0, cfg.spk_dim, (batch,))

    with torch.no_grad():
        ref_out = predictor(
            torch.from_numpy(data), True, torch.from_numpy(cond),
            torch.from_numpy(spk[:, None]), None, 0).numpy()

    ours, _, _ = predictor_apply(
        params, cfg, jnp.asarray(data, jnp.int32), jnp.asarray(True),
        jnp.asarray(cond), jnp.asarray(spk, jnp.int32),
        init_tier_state(cfg, batch))

    assert ref_out.shape == ours.shape
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-5)


def test_tbptt_carry_parity():
    """Two consecutive chunks with hidden-state carry must match the
    reference's Runner hidden_states dict behavior (ref model.py:328-349)."""
    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=2, dim=16, cond_dim=7,
                      spk_dim=2)
    params, predictor = build_pair(cfg, seed=3)

    batch = 2
    seq_len = 2 * cfg.lookback
    rng = np.random.RandomState(2)
    state = init_tier_state(cfg, batch)
    for k in range(3):
        data = rng.randint(0, 256, (batch, seq_len + cfg.lookback - 1))
        cond = rng.rand(batch, seq_len // cfg.lookback,
                        cfg.effective_cond_dim).astype(np.float32)
        spk = rng.randint(0, cfg.spk_dim, (batch,))
        reset = k == 0
        with torch.no_grad():
            ref_out = predictor(
                torch.from_numpy(data), reset, torch.from_numpy(cond),
                torch.from_numpy(spk[:, None]), None, k).numpy()
        ours, state, _ = predictor_apply(
            params, cfg, jnp.asarray(data, jnp.int32), jnp.asarray(reset),
            jnp.asarray(cond), jnp.asarray(spk, jnp.int32), state)
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4,
                                   err_msg=f"chunk {k}")


def test_loss_parity():
    """sequence_nll_loss_bits == reference nn.sequence_nll_loss_bits."""
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        import nn as ref_nn
    finally:
        sys.path.remove("/root/reference")
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 10, 256).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    tgt = rng.randint(0, 256, (4, 10))
    ours = float(sequence_nll_loss_bits(lp, jnp.asarray(tgt)))
    theirs = float(ref_nn.sequence_nll_loss_bits(
        torch.log_softmax(torch.from_numpy(logits), dim=-1),
        torch.from_numpy(tgt)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_training_trajectory_parity():
    """Optimizer-semantics gate: from identical weights and data, our
    clipped-Adam TBPTT steps track the reference's closure-step losses."""
    import optax
    from msnv_tpu.training.optim import make_optimizer
    from msnv_tpu.config import TrainConfig

    cfg = ModelConfig(frame_sizes=(4, 4), n_rnn=1, dim=16, cond_dim=7,
                      spk_dim=2)
    params, predictor = build_pair(cfg, seed=7)

    sys_path_ref = "/root/reference"
    import sys
    sys.path.insert(0, sys_path_ref)
    try:
        import nn as ref_nn
        from optim import gradient_clipping
    finally:
        sys.path.remove(sys_path_ref)

    lr = 1e-3
    t_opt = gradient_clipping(
        torch.optim.Adam(predictor.parameters(), lr=lr))

    tc = TrainConfig(learning_rate=lr, grad_clip=1.0)
    j_opt = make_optimizer(tc)
    j_opt_state = j_opt.init(params)
    from msnv_tpu.training.step import make_train_step
    step = make_train_step(cfg, j_opt, donate=False)

    batch, seq_len = 3, 2 * cfg.lookback
    rng = np.random.RandomState(3)
    state = init_tier_state(cfg, batch)
    ours_losses, ref_losses = [], []
    for k in range(5):
        data = rng.randint(0, 256, (batch, seq_len + cfg.lookback - 1))
        target = rng.randint(0, 256, (batch, seq_len))
        cond = rng.rand(batch, seq_len // cfg.lookback,
                        cfg.effective_cond_dim).astype(np.float32)
        spk = rng.randint(0, cfg.spk_dim, (batch,))

        params, j_opt_state, state, loss = step(
            params, j_opt_state, state, jnp.asarray(data, jnp.int32),
            jnp.asarray(k == 0), jnp.asarray(target, jnp.int32),
            jnp.asarray(cond), jnp.asarray(spk, jnp.int32))
        ours_losses.append(float(loss))

        def closure():
            out = predictor(torch.from_numpy(data), k == 0,
                            torch.from_numpy(cond),
                            torch.from_numpy(spk[:, None]), None, k)
            l = ref_nn.sequence_nll_loss_bits(
                out, torch.from_numpy(target))
            l.backward()
            return l
        t_opt.zero_grad(set_to_none=False)
        l = t_opt.step(closure)
        ref_losses.append(float(l))

    np.testing.assert_allclose(ours_losses, ref_losses, atol=2e-3)


@pytest.mark.parametrize("frame_sizes,n_rnn", [((4, 4), 1), ((4, 5, 4), 1)])
def test_generator_sequence_parity(frame_sizes, n_rnn):
    """THE generator gate: under argmax-dominant (sharpened) sampling, the
    ACTUAL reference Generator's per-sample Python loop and our nested-scan
    generator emit IDENTICAL sample sequences — pinning the cond-frame
    indexing (j = i//lookback - 1), tier slot clocks, q_zero seeding, and
    output-length quirk directly against the reference."""
    import contextlib
    import io

    cfg = ModelConfig(frame_sizes=frame_sizes, n_rnn=n_rnn, dim=16,
                      cond_dim=7, spk_dim=2)
    params, _predictor = build_pair(cfg, seed=0)
    out = params["mlp"]["out"]
    params["mlp"]["out"] = {"w": out["w"] * 1e6, "b": out["b"] * 1e6}

    from ref_compat import import_reference_model
    ref_model = import_reference_model()
    tm = ref_model.SampleRNN(
        frame_sizes=list(cfg.frame_sizes), n_rnn=cfg.n_rnn, dim=cfg.dim,
        learn_h0=True, q_levels=256, ulaw=True, weight_norm=False,
        cond_dim=7, spk_dim=2, qrnn=False)
    from ref_compat import copy_params_to_torch
    copy_params_to_torch(params, cfg, tm)
    gen_ref = ref_model.Generator(tm, cuda=False)

    frames = 4
    rng = np.random.RandomState(1)
    cond = rng.rand(frames, 7).astype(np.float32)
    with contextlib.redirect_stdout(io.StringIO()):  # silences per-sample prints
        with torch.no_grad():
            wav_ref = gen_ref(1, frames * cfg.lookback, cond, 1).numpy()[0]

    from msnv_tpu.models.generate import generate_fn
    audio, _ = generate_fn(params, cfg)(
        jnp.asarray(cond[None]), jnp.asarray([1], jnp.int32),
        jax.random.PRNGKey(0))
    wav_ours = np.asarray(audio[0])
    assert wav_ref.shape == wav_ours.shape
    # exact under argmax; tolerate <1% near-tie flips across torch/jax f32
    assert np.mean(np.abs(wav_ref - wav_ours) > 1e-6) < 0.01
