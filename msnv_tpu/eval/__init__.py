"""Objective evaluation metrics (MCD, F0 RMSE, V/UV error)."""

from msnv_tpu.eval.metrics import (  # noqa: F401
    evaluate_pair,
    f0_metrics,
    frame_f0,
    lf0_track_to_f0,
    mcd,
    mel_cepstrum,
)
