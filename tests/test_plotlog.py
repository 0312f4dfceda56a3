"""plotlog CLI (ref plotlog.py:12-108 capability): log-regex parsing and
PNG rendering from both a tee'd `log` file and `stats.json`."""

import json
import os

import numpy as np

from msnv_tpu.cli.plotlog import main as plotlog_main, parse_log
from msnv_tpu.utils.logging import init_random_seed


LOG = """starting run
it 100\ttraining_loss: 7.9123\ttraining_loss/running_avg: 8.0011
it 200\ttraining_loss: 7.1054\ttraining_loss/running_avg: 7.8120
epoch 1\ttraining_loss: 7.1054\ttraining_loss/running_avg: 7.8120\tvalidation_loss: 7.3001\ttest_loss: 7.4102
it 300\ttraining_loss: 6.8020
epoch 2\ttraining_loss: 6.8020\tvalidation_loss: 6.9050\ttest_loss: 7.0103
unrelated noise line
"""


def _write_log(tmp_path):
    d = tmp_path / "results"
    d.mkdir()
    (d / "log").write_text(LOG)
    return str(d)


def test_parse_log_series(tmp_path):
    d = _write_log(tmp_path)
    data = parse_log(os.path.join(d, "log"))
    assert data["iterations"] == [100, 200, 300]
    assert data["training_loss"] == [7.9123, 7.1054, 6.8020]
    # the third iteration line has no running_avg field
    assert data["running_avg"] == [8.0011, 7.8120, None]
    assert data["epochs"] == [1, 2]
    assert data["validation_loss"] == [7.3001, 6.9050]
    assert data["test_loss"] == [7.4102, 7.0103]


def test_plotlog_from_log_and_stats(tmp_path):
    d = _write_log(tmp_path)
    # from the tee'd log
    plotlog_main([d])
    assert os.path.isfile(os.path.join(d, "nll.png"))
    # perplexity mode (2^NLL, ref plotlog.py:82)
    plotlog_main([d, "--perplexity"])
    assert os.path.isfile(os.path.join(d, "perplexity.png"))
    # stats.json takes precedence when present
    stats = parse_log(os.path.join(d, "log"))
    with open(os.path.join(d, "stats.json"), "w") as fh:
        json.dump(stats, fh)
    out = os.path.join(d, "from_stats.png")
    plotlog_main([d, "--out", out])
    assert os.path.isfile(out)


def test_init_random_seed_deterministic():
    """ref train.py:145-151 semantics: one call pins python+numpy streams."""
    init_random_seed(77977)
    a = np.random.rand(4)
    import random
    ra = random.random()
    init_random_seed(77977)
    np.testing.assert_array_equal(a, np.random.rand(4))
    assert ra == random.random()
