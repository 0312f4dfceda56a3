"""End-to-end CLI: train a tiny model on a synthetic corpus, then synthesize
WAVs from the saved checkpoint via the generation CLI (full-system test:
corpus build -> training -> checkpoint -> tag round-trip -> generation)."""

import json
import os

import numpy as np
import pytest

from msnv_tpu.data.synthetic import make_synthetic_corpus


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    data_dir = os.path.join(root, "datasets")
    os.makedirs(data_dir)
    make_synthetic_corpus(data_dir, n_speakers=2, utts_per_speaker=2,
                          frames_per_utt=150, cond_len=16,
                          partitions=("train", "validation", "test"))
    results = os.path.join(root, "results")

    from msnv_tpu.cli.train import main as train_main
    cwd = os.getcwd()
    os.chdir(root)
    try:
        train_main([
            "--exp", "clitest",
            "--frame_sizes", "4", "4",
            "--n_rnn", "1", "--dim", "32",
            "--seq_len", "64", "--batch_size", "4",
            "--cond_len", "16", "--norm_ind", "false",
            "--datasets_path", data_dir,
            "--dataset", "wav/", "--cond_set", "cond/",
            "--results_path", results,
            "--epoch_limit", "2",
            "--learning_rate", "2e-3",
        ])
    finally:
        os.chdir(cwd)
    return root, data_dir, results


def test_train_cli_outputs(trained):
    root, data_dir, results = trained
    tags = os.listdir(results)
    assert len(tags) == 1
    exp_dir = os.path.join(results, tags[0])
    assert os.path.isfile(os.path.join(exp_dir, "log"))
    assert os.path.isfile(os.path.join(exp_dir, "stats.json"))
    assert os.path.isfile(os.path.join(exp_dir, "loss.svg"))
    ckpts = os.listdir(os.path.join(exp_dir, "checkpoints"))
    assert any(c.startswith("ep2-it") for c in ckpts)
    assert any(c.startswith("best-") for c in ckpts)
    with open(os.path.join(exp_dir, "stats.json")) as f:
        stats = json.load(f)
    tl = [v for v in stats["training_loss"] if v is not None]
    assert tl[-1] < tl[0]  # learned something


def test_train_cli_objective_metrics(trained, tmp_path):
    """--metrics_every scores MCD/F0/V-UV on validation utterances and
    persists them to stats.json."""
    root, data_dir, _ = trained
    results = str(tmp_path / "results_metrics")
    from msnv_tpu.cli.train import main as train_main
    cwd = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        train_main([
            "--exp", "clitest-metrics", "--frame_sizes", "4", "4",
            "--n_rnn", "1", "--dim", "32", "--seq_len", "64",
            "--batch_size", "4", "--cond_len", "16", "--norm_ind", "false",
            "--datasets_path", data_dir, "--results_path", results,
            "--epoch_limit", "1", "--learning_rate", "2e-3",
            "--metrics_every", "1",
        ])
    finally:
        os.chdir(cwd)
    exp_dir = os.path.join(results, os.listdir(results)[0])
    with open(os.path.join(exp_dir, "stats.json")) as f:
        stats = json.load(f)
    for field in ("mcd_db", "f0_rmse_hz", "vuv_error_rate"):
        vals = [v for v in stats[field] if v is not None]
        assert vals, (field, stats.keys())
        assert np.isfinite(vals[-1])


def test_train_cli_resume(trained):
    root, data_dir, results = trained
    from msnv_tpu.cli.train import main as train_main
    cwd = os.getcwd()
    os.chdir(root)
    try:
        # epoch_limit 3 resumes from epoch 2 and trains exactly one more
        train_main([
            "--exp", "clitest", "--frame_sizes", "4", "4",
            "--n_rnn", "1", "--dim", "32", "--seq_len", "64",
            "--batch_size", "4", "--cond_len", "16", "--norm_ind", "false",
            "--datasets_path", data_dir, "--results_path", results,
            "--epoch_limit", "3", "--learning_rate", "2e-3",
        ])
    finally:
        os.chdir(cwd)
    exp_dir = os.path.join(results, os.listdir(results)[0])
    ckpts = os.listdir(os.path.join(exp_dir, "checkpoints"))
    assert any(c.startswith("ep3-it") for c in ckpts)


def test_generate_cli(trained):
    root, data_dir, results = trained
    exp_dir = os.path.join(results, os.listdir(results)[0])
    ckpts = [c for c in os.listdir(os.path.join(exp_dir, "checkpoints"))
             if c.startswith("best-")]
    model_path = os.path.join(exp_dir, "checkpoints", ckpts[0])

    # generation lists: two utterances, one per speaker
    names = sorted(os.path.splitext(f)[0] for f in
                   os.listdir(os.path.join(data_dir, "wav")))[:2]
    gen_cond = os.path.join(root, "generate_cond.list")
    gen_spk = os.path.join(root, "generate_spk.list")
    with open(gen_cond, "w") as f:
        f.write("\n".join(names))
    with open(gen_spk, "w") as f:
        f.write("\n".join(["0", "1"][:len(names)]))

    out_dir = os.path.join(root, "gen_out")
    from msnv_tpu.cli.generate import main as gen_main
    gen_main([
        "--model", model_path,
        "--cond_path", os.path.join(data_dir, "cond"),
        "--cond_list", gen_cond, "--spk_list", gen_spk,
        "--min_max", os.path.join(data_dir, "npy_datasets",
                                  "min_max_joint.npy"),
        "--out_dir", out_dir,
    ])
    wavs = os.listdir(out_dir)
    assert len(wavs) == len(names)
    from msnv_tpu.data.wavio import read_wav
    for w in wavs:
        audio, sr = read_wav(os.path.join(out_dir, w))
        assert sr == 16000
        assert audio.shape[0] > 0
        assert np.isfinite(audio).all()


def test_evaluate_cli(trained, capsys):
    root, data_dir, results = trained
    exp_dir = os.path.join(results, os.listdir(results)[0])
    ckpts = [c for c in os.listdir(os.path.join(exp_dir, "checkpoints"))
             if c.startswith("best-")]
    model_path = os.path.join(exp_dir, "checkpoints", ckpts[0])
    from msnv_tpu.cli.evaluate import main as eval_main
    cwd = os.getcwd()
    os.chdir(root)
    try:
        eval_main(["--model", model_path, "--datasets_path", data_dir,
                   "--partitions", "validation"])
    finally:
        os.chdir(cwd)
    out = capsys.readouterr().out
    assert "validation: NLL" in out
    import re
    m = re.search(r"NLL ([\d.]+) bits", out)
    assert m and 0.0 < float(m.group(1)) < 10.0


def test_generate_cli_eigen_voice(trained):
    """spk_list entries as comma-separated weights mix speaker embeddings
    (thesis sec 3.3 eigen-voice) straight from the CLI."""
    root, data_dir, results = trained
    exp_dir = os.path.join(results, os.listdir(results)[0])
    ckpts = [c for c in os.listdir(os.path.join(exp_dir, "checkpoints"))
             if c.startswith("best-")]
    model_path = os.path.join(exp_dir, "checkpoints", ckpts[0])
    names = sorted(os.path.splitext(f)[0] for f in
                   os.listdir(os.path.join(data_dir, "wav")))[:2]
    gen_cond = os.path.join(root, "mix_cond.list")
    gen_spk = os.path.join(root, "mix_spk.list")
    with open(gen_cond, "w") as f:
        f.write("\n".join(names))
    with open(gen_spk, "w") as f:
        f.write("0.3,0.7\n1\n")      # one mixed voice, one plain id

    out_dir = os.path.join(root, "mix_out")
    from msnv_tpu.cli.generate import main as gen_main
    gen_main([
        "--model", model_path,
        "--cond_path", os.path.join(data_dir, "cond"),
        "--cond_list", gen_cond, "--spk_list", gen_spk,
        "--min_max", os.path.join(data_dir, "npy_datasets",
                                  "min_max_joint.npy"),
        "--out_dir", out_dir,
    ])
    wavs = sorted(os.listdir(out_dir))
    assert len(wavs) == 2
    assert any("spk-mix0.3-0.7" in w for w in wavs)
    from msnv_tpu.data.wavio import read_wav
    for w in wavs:
        audio, sr = read_wav(os.path.join(out_dir, w))
        assert np.isfinite(audio).all() and audio.shape[0] > 0
