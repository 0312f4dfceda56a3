"""Optimizer: element-wise-clipped Adam with optional multi-step LR decay.

Parity targets:
- grad value clipping to [-1, 1] BEFORE the Adam update — the reference wraps
  the optimizer and hardtanh's every grad in the closure
  (ref optim.py:4-21).
- Adam(lr), betas (0.9, 0.999) torch defaults (ref train.py:238).
- optional MultiStepLR(milestones=[15, 35], gamma=0.1) stepped per EPOCH
  (ref train.py:239-240, trainer/__init__.py:58-59).
"""

from __future__ import annotations

import optax

from msnv_tpu.config import TrainConfig


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Step-indexed schedule equal to epoch-stepped MultiStepLR."""
    if not cfg.scheduler:
        return cfg.learning_rate
    boundaries = {
        int(m) * steps_per_epoch: cfg.scheduler_gamma
        for m in cfg.scheduler_milestones
    }
    return optax.piecewise_constant_schedule(
        init_value=cfg.learning_rate, boundaries_and_scales=boundaries)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1):
    """optax chain: clip-by-value then Adam."""
    return optax.chain(
        optax.clip(cfg.grad_clip),
        optax.adam(lr_schedule(cfg, steps_per_epoch),
                   b1=0.9, b2=0.999, eps=1e-8),
    )
