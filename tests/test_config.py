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


def test_tag_roundtrip_fuzz():
    import random
    rnd = random.Random(7)
    for _ in range(50):
        n_tiers = rnd.choice([2, 3])
        fs = tuple(rnd.choice([2, 4, 5, 8, 16, 20]) for _ in range(n_tiers))
        cfg = ExperimentConfig(
            exp=rnd.choice(["a", "exp-b", "samplernn"]),
            model=ModelConfig(
                frame_sizes=fs,
                n_rnn=rnd.randint(1, 3),
                dim=rnd.choice([16, 64, 512, 1024]),
                learn_h0=rnd.random() < 0.5,
                ulaw=rnd.random() < 0.5,
                q_levels=rnd.choice([16, 256]),
                weight_norm=rnd.random() < 0.5,
                cond_dim=rnd.randint(1, 90),
                cond_len=rnd.choice([16, 80]),
                spk_dim=rnd.randint(1, 8),
                look_ahead=rnd.random() < 0.5,
                variant=rnd.choice(["identity", "bottleneck", "gan"]),
                ind_cond_dim=rnd.randint(2, 60)),
            train=TrainConfig(
                seq_len=rnd.choice([64, 1040]),
                batch_size=rnd.choice([4, 128]),
                learning_rate=rnd.choice([1e-3, 1e-4, 2e-3]),
                seed=rnd.randint(0, 10 ** 6),
                scheduler=rnd.random() < 0.5),
            data=DataConfig(norm_ind=rnd.random() < 0.5,
                            static_spk=rnd.random() < 0.5))
        back = parse_tag(make_tag(cfg), exp=cfg.exp)
        assert back.model == cfg.model, make_tag(cfg)
        assert back.train.seq_len == cfg.train.seq_len
        assert back.train.learning_rate == cfg.train.learning_rate
        assert back.train.seed == cfg.train.seed
        assert back.data.norm_ind == cfg.data.norm_ind
        assert back.data.static_spk == cfg.data.static_spk


def test_tag_path_values_stay_single_level():
    """A non-default path-like cond_set/dataset must not put '/' in the
    tag (it would nest the results dir and break enumeration +
    tag_from_checkpoint_path); the escape round-trips."""
    import dataclasses
    cfg = preset("samplernn")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, cond_set="wav/",
                                      dataset="sub/wav/"))
    tag = make_tag(cfg)
    assert "/" not in tag, tag
    back = parse_tag(tag, exp=cfg.exp)
    assert back.data.cond_set == "wav/"
    assert back.data.dataset == "sub/wav/"
    # the escape is injective: literal '+' (alone and in every mix with
    # '/' and the escape letters) survives the round-trip
    for v in ("a+b", "+", "++", "+-", "+p", "+s", "a+/", "/+", "+p/s+",
              "wav+", "p+sp/"):
        cfg_v = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, cond_set=v))
        t = make_tag(cfg_v)
        assert "/" not in t, (v, t)
        assert parse_tag(t, exp=cfg_v.exp).data.cond_set == v, (v, t)


def test_tag_legacy_bare_plus_escape_decodes():
    """Directories written under the short-lived earlier escape scheme
    ('/' encoded as a bare '+') must still round-trip: a '+' not followed
    by 'p'/'s' decodes as '/', so --resume finds the old results dir."""
    legacy_tag = make_tag(preset("samplernn")).replace(
        "~", "~cond_set:wav+~", 1)   # 'wav/' under the legacy scheme
    back = parse_tag(legacy_tag, exp="samplernn")
    assert back.data.cond_set == "wav/"
