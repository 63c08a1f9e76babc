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
