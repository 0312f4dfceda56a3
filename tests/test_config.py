"""Config tag round-trip (the reference's experiment-tag capability,
ref train.py:66-85 / generate.py:126-129)."""

from msnv_tpu.config import (
    ExperimentConfig, ModelConfig, TrainConfig, DataConfig,
    make_tag, parse_tag, preset, PRESETS,
)
import dataclasses


def test_default_tag_minimal():
    # exp and frame_sizes are always emitted (both are required CLI args in
    # the reference, ref train.py:343-348); everything else is
    # default-suppressed.
    cfg = ExperimentConfig(exp="samplernn")
    assert make_tag(cfg) == "exp:samplernn~frame_sizes:20,4"


def test_tag_roundtrip_canonical():
    cfg = preset("samplernn")
    tag = make_tag(cfg)
    back = parse_tag(tag)
    assert back.model == cfg.model
    assert back.train.seq_len == cfg.train.seq_len
    assert back.train.learning_rate == cfg.train.learning_rate
    assert back.data.norm_ind == cfg.data.norm_ind
    assert back.exp == "samplernn"


def test_tag_roundtrip_all_presets():
    for name in PRESETS:
        cfg = preset(name)
        back = parse_tag(make_tag(cfg), exp=cfg.exp)
        assert back.model == cfg.model, name


def test_tag_value_formats():
    cfg = ExperimentConfig(
        exp="x",
        model=ModelConfig(frame_sizes=(20, 4), look_ahead=True),
        train=TrainConfig(learning_rate=1e-4),
    )
    tag = make_tag(cfg)
    assert "frame_sizes:20,4" in tag
    assert "look_ahead:T" in tag
    assert "learning_rate:0.0001" in tag


def test_derived_properties():
    m = ModelConfig(frame_sizes=(20, 4))
    assert m.ns_frame_samples == (20, 80)
    assert m.lookback == 80
    m3 = ModelConfig(frame_sizes=(4, 5, 4))
    assert m3.ns_frame_samples == (4, 20, 80)
