"""Metrics, logging, and run-directory management.

Capability parity with the reference's observability (SURVEY.md §5.5):
scalar summaries per loss, per-class averages on a cadence, ``log_train.txt``
stream, and the self-archival habit (config + code snapshot into the run
dir, train_cloudAAE_ycbv.py:151-163).  Output is CSV + stdout instead of
TF summaries.  Profiling: ``train.py --profile`` captures a ``jax.profiler``
trace of a few steady-state steps into ``<run_dir>/profile/`` (replacing
the reference's wall-clock-only timing, SURVEY.md §5.1); see
:class:`StepProfiler`.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import os
import shutil
import time
from datetime import datetime
from typing import Any

import numpy as np

from cloudaae_tpu.config import YCB_CLASS_NAMES, Config


def make_run_dir(cfg: Config) -> str:
    """log/<num_class>/6d/<timestamp>/ layout, as the reference (:151)."""
    stamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    run_dir = os.path.join(
        cfg.log_dir, str(cfg.model.num_class), "6d", stamp
    )
    os.makedirs(run_dir, exist_ok=True)
    # self-archival: dump the full config and snapshot the package source
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    snap = os.path.join(run_dir, "code_snapshot")
    if not os.path.exists(snap):
        shutil.copytree(
            pkg_dir, os.path.join(snap, "cloudaae_tpu"),
            ignore=shutil.ignore_patterns("__pycache__"),
        )
    return run_dir


class MetricLogger:
    """Stdout + log_train.txt + metrics.csv (+ TensorBoard when available),
    with per-class accumulation.

    Scalar-summary parity with the reference's ``tf.summary`` stream
    (train_cloudAAE_ycbv.py:204-261,286-288) via torch's SummaryWriter when
    installed; plain CSV otherwise.
    """

    def __init__(self, run_dir: str, num_class: int, tensorboard: bool = True):
        self.run_dir = run_dir
        self.num_class = num_class
        self._log = open(os.path.join(run_dir, "log_train.txt"), "a")
        self._csv_path = os.path.join(run_dir, "metrics.csv")
        self._csv = None
        self._writer = None
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None
        self._class_sums = np.zeros((3, num_class))
        self._class_counts = np.zeros(num_class)
        self._t0 = time.time()

    def log_string(self, msg: str) -> None:
        """Mirrors ``log_string`` (train_cloudAAE_ycbv.py:130-133)."""
        self._log.write(msg + "\n")
        self._log.flush()
        print(msg, flush=True)

    def step(self, step: int, epoch: int, metrics: dict[str, Any]) -> None:
        host = {
            k: np.asarray(v)
            for k, v in metrics.items()
        }
        self._class_sums[0] += host["per_class_xyz"]
        self._class_sums[1] += host["per_class_trans"]
        self._class_sums[2] += host["per_class_axag"]
        self._class_counts += host["per_class_count"]

        row = {
            "step": step,
            "epoch": epoch,
            "time": time.time() - self._t0,
            "total_loss": float(host["total_loss"]),
            "xyz_loss": float(host["xyz_loss"]),
            "trans_loss": float(host["trans_loss"]),
            "axag_loss": float(host["axag_loss"]),
        }
        # the symmetry-aware rotation loss when --sym-loss is on (the plain
        # geodesic above stays for comparability across runs)
        if "axag_sym_loss" in host:
            row["axag_sym_loss"] = float(host["axag_sym_loss"])
        if self._writer is None:
            self._csv = open(self._csv_path, "a", newline="")
            self._writer = csv.DictWriter(self._csv, fieldnames=list(row))
            if self._csv.tell() == 0:
                self._writer.writeheader()
        self._writer.writerow(row)
        if self._tb is not None:
            for k in row:
                if k.endswith("_loss"):
                    self._tb.add_scalar(k, row[k], step)

    def flush_per_class(self, step: int) -> dict[str, float]:
        """Emit and reset per-class averages (reference cadence: every 1000
        batches, train_cloudAAE_ycbv.py:403-418)."""
        out = {}
        counts = np.maximum(self._class_counts, 1)
        for i in range(self.num_class):
            name = (
                YCB_CLASS_NAMES[i]
                if i < len(YCB_CLASS_NAMES)
                else f"class_{i}"
            )
            out[f"xyz/{name}"] = self._class_sums[0, i] / counts[i]
            out[f"trans/{name}"] = self._class_sums[1, i] / counts[i]
            out[f"axag/{name}"] = self._class_sums[2, i] / counts[i]
        with open(
            os.path.join(self.run_dir, f"per_class_{step:09d}.json"), "w"
        ) as f:
            json.dump(out, f, indent=2)
        if self._tb is not None:
            for k, v in out.items():
                self._tb.add_scalar(k, float(v), step)
        self._class_sums[:] = 0
        self._class_counts[:] = 0
        return out

    def close(self):
        self._log.close()
        if self._csv:
            self._csv.close()
        if self._tb is not None:
            self._tb.close()


class StepProfiler:
    """``jax.profiler`` trace of a window of steady-state train steps.

    Captures steps [start, start + num_steps) into ``<run_dir>/profile/``
    (viewable with TensorBoard / xprof / Perfetto).  ``start`` defaults past
    compilation and warmup so the trace shows the steady-state step.  Call
    :meth:`at_step` once per loop iteration and :meth:`stop` on exit (stop
    is idempotent; a trace left open because the loop ended early is closed
    cleanly).
    """

    def __init__(self, run_dir: str, start: int = 10, num_steps: int = 5):
        self.trace_dir = os.path.join(run_dir, "profile")
        self.start = start
        self.stop_at = start + num_steps
        self._active = False
        self._done = False

    def at_step(self, step: int) -> None:
        import jax

        if not self._done and not self._active and step >= self.start:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif self._active and step >= self.stop_at:
            self.stop()

    def stop(self) -> None:
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


def add_metrics(pred_points: np.ndarray, gt_points: np.ndarray):
    """ADD / ADD-S between a model cloud under predicted vs gt pose.

    ADD = mean_i |p_i - g_i| (matched points);
    ADD-S = mean_i min_j |p_i - g_j| (symmetric / closest point).
    New capability: the reference only prints trans/axag losses
    (evaluate_cloudAAE_ycbv.py:649-656); the paper's headline metrics are
    ADD/ADD-S.
    """
    add = float(np.mean(np.linalg.norm(pred_points - gt_points, axis=-1)))
    d = ((pred_points[:, None, :] - gt_points[None, :, :]) ** 2).sum(-1)
    add_s = float(np.mean(np.sqrt(d.min(axis=1))))
    return add, add_s
