"""Headless visualization smoke tests (PNG artifacts)."""

import os

import numpy as np
import pytest

pytest.importorskip("matplotlib")


def test_plot_clouds(tmp_path):
    from cloudaae_tpu.visualize import plot_clouds

    rng = np.random.default_rng(0)
    out = str(tmp_path / "clouds.png")
    plot_clouds(
        [("a", [(rng.normal(size=(50, 3)), "tab:red", "x")]),
         ("b", [(rng.normal(size=(30, 3)), "tab:blue", "y")])],
        out, title="t",
    )
    assert os.path.getsize(out) > 5000


def test_render_eval_result(tmp_path):
    from cloudaae_tpu.visualize import render_eval_result

    rng = np.random.default_rng(1)
    out = str(tmp_path / "eval.png")
    mdl = rng.normal(size=(100, 3)) * 0.05
    render_eval_result(
        mdl + [0, 0, 0.7], mdl, np.eye(3), np.array([0, 0, 0.7]),
        np.eye(3), np.array([0, 0, 0.71]), out, "frame 0",
    )
    assert os.path.getsize(out) > 5000


def test_plot_loss_curves(tmp_path):
    from cloudaae_tpu.visualize import plot_loss_curves

    csv_path = tmp_path / "metrics.csv"
    lines = ["step,epoch,time,total_loss,xyz_loss,trans_loss,axag_loss"]
    for s in range(1, 20):
        lines.append(f"{s},0,{s*0.1},{2.0/s},{0.1/s},{0.2/s},{1.5/s}")
    csv_path.write_text("\n".join(lines))
    out = str(tmp_path / "curves.png")
    plot_loss_curves(str(csv_path), out)
    assert os.path.getsize(out) > 5000
