"""Headless visualization: synthesized samples and pose results to PNG.

The reference's visual spot-checks open interactive open3d windows
(train_cloudAAE_ycbv.py:370-391, evaluate_cloudAAE_ycbv.py:571-603,
SURVEY.md §4 "visual spot-checks as tests"); on a headless TPU host the
equivalent is matplotlib 3D scatter panels written to disk.

    python -m cloudaae_tpu.visualize --out sample.png [--class-id 9]

renders one synthesized training sample: the posed model, the occluders,
the noisy network input, and the clean reconstruction target.
"""

from __future__ import annotations

import argparse

import numpy as np


def _scatter(ax, pts: np.ndarray, color: str, label: str, size: float = 2.0):
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=size, c=color, label=label)


def plot_clouds(panels, out_path: str, title: str = "") -> None:
    """panels: list of (panel_title, [(points, color, label), ...])."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(panels)
    fig = plt.figure(figsize=(5 * n, 5))
    for i, (ptitle, clouds) in enumerate(panels):
        ax = fig.add_subplot(1, n, i + 1, projection="3d")
        for pts, color, label in clouds:
            _scatter(ax, np.asarray(pts), color, label)
        ax.set_title(ptitle)
        ax.legend(loc="upper right", fontsize=7)
        ax.view_init(elev=-70, azim=-90)  # camera-ish view (+z forward)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def render_synth_sample(
    obj_models: np.ndarray,
    class_id: int,
    out_path: str,
    seed: int = 0,
) -> None:
    """Synthesize one sample and render its stages side by side."""
    import jax
    import jax.numpy as jnp

    from cloudaae_tpu.config import Config
    from cloudaae_tpu.synth import sample_pose, synthesize_one

    cfg = Config()
    key = jax.random.key(seed)
    k_pose, k_synth = jax.random.split(key)
    axag, rot, trans = sample_pose(k_pose, cfg.synth.camera)
    out = synthesize_one(
        jnp.asarray(obj_models[class_id, :, :3]), axag, trans, k_synth, cfg.synth
    )
    from cloudaae_tpu import so3

    posed = so3.transform_points(jnp.asarray(obj_models[class_id, :, :3]), rot, trans)
    plot_clouds(
        [
            (
                "scene (posed model + occluders)",
                [
                    (posed, "tab:green", "model"),
                    (out["occluder"], "tab:blue", "occluder"),
                ],
            ),
            (
                "network input (visible, noisy, 256)",
                [(out["input_points"], "tab:red", "input")],
            ),
            (
                "reconstruction target (clean visible, 1024)",
                [(out["target_points"], "tab:purple", "target")],
            ),
        ],
        out_path,
        title=f"class {class_id}  |t|={float(jnp.linalg.norm(trans)):.2f} m  "
        f"visible {int(out['num_vis_in'])}/{2048 + cfg.synth.num_occluder_points}",
    )


def render_eval_result(
    segment: np.ndarray,
    model_points: np.ndarray,
    R_pred: np.ndarray,
    t_pred: np.ndarray,
    R_gt: np.ndarray,
    t_gt: np.ndarray,
    out_path: str,
    title: str = "",
) -> None:
    """Observed segment vs the model under predicted and gt poses —
    the headless counterpart of the eval script's open3d windows
    (evaluate_cloudAAE_ycbv.py:583-603)."""
    pred = model_points @ np.asarray(R_pred).T + np.asarray(t_pred)
    gt = model_points @ np.asarray(R_gt).T + np.asarray(t_gt)
    plot_clouds(
        [
            (
                "prediction vs segment",
                [(segment, "tab:red", "segment"), (pred, "tab:blue", "model@pred")],
            ),
            (
                "prediction vs ground truth",
                [(gt, "tab:green", "model@gt"), (pred, "tab:blue", "model@pred")],
            ),
        ],
        out_path,
        title=title,
    )


def plot_loss_curves(metrics_csv: str, out_path: str) -> None:
    """Loss curves from a run's metrics.csv (train.py / MetricLogger)."""
    import csv

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cols: dict[str, list] = {}
    with open(metrics_csv) as f:
        for row in csv.DictReader(f):
            for k, v in row.items():
                cols.setdefault(k, []).append(float(v))
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    steps = cols["step"]
    for ax, key, scale in (
        (axes[0], "xyz_loss", "log"),
        (axes[1], "trans_loss", "log"),
        (axes[2], "axag_loss", "linear"),
    ):
        ax.plot(steps, cols[key], lw=0.8)
        ax.set_yscale(scale)
        ax.set_title(key)
        ax.set_xlabel("step")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="synth_sample.png")
    p.add_argument("--class-id", type=int, default=9)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-root", default="/root/reference")
    args = p.parse_args(argv)

    import os

    from cloudaae_tpu.data import load_object_models

    obj_models = load_object_models(
        os.path.join(args.data_root, "object_model_tfrecord/obj_models.tfrecords")
    )
    render_synth_sample(obj_models, args.class_id, args.out, args.seed)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
