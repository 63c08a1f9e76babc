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


_COLOR_RGB = {
    "C0": (31, 119, 180), "C1": (255, 127, 14), "C2": (44, 160, 44),
    "C3": (214, 39, 40), "C4": (148, 103, 189), "C5": (140, 86, 75),
    "gray": (127, 127, 127), "red": (214, 39, 40), "green": (44, 160, 44),
    "blue": (31, 119, 180), "orange": (255, 127, 14), "black": (0, 0, 0),
}


def export_ply(out_path: str, clouds) -> None:
    """Write labeled point clouds to one colored ascii PLY.

    ``clouds``: [(points (N,3), color_name, label), ...].  The file opens in
    any 3D viewer (meshlab, open3d, blender) — the portable stand-in for the
    reference's interactive open3d windows
    (evaluate_cloudAAE_ycbv.py:571-603) on a headless TPU host.  Readable
    back via data.linemod.read_ply.
    """
    rows = []
    for pts, color, _ in clouds:
        rgb = _COLOR_RGB.get(color, (127, 127, 127))
        for p in np.asarray(pts, np.float64):
            rows.append((p[0], p[1], p[2], *rgb))
    with open(out_path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(rows)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for x, y, z, r, g, b in rows:
            f.write(f"{x:.6f} {y:.6f} {z:.6f} {r} {g} {b}\n")


_HTML_VIEWER = """<!doctype html><meta charset="utf-8">
<title>{title}</title>
<style>body{{margin:0;background:#111;color:#eee;font:13px sans-serif}}
#hud{{position:fixed;top:8px;left:8px}}</style>
<canvas id="c"></canvas><div id="hud">{title} — drag to orbit, wheel to
zoom<br>{legend}</div>
<script>
const CLOUDS={clouds_json};
const cv=document.getElementById("c"),ctx=cv.getContext("2d");
let rx=-1.2,ry=0,zoom=1,cx=0,cy=0,cz=0,n=0;
for(const c of CLOUDS)for(const p of c.pts){{cx+=p[0];cy+=p[1];cz+=p[2];n++}}
cx/=n;cy/=n;cz/=n;
let scale=0;for(const c of CLOUDS)for(const p of c.pts)
  scale=Math.max(scale,Math.hypot(p[0]-cx,p[1]-cy,p[2]-cz));
function draw(){{
  cv.width=innerWidth;cv.height=innerHeight;
  const s=Math.min(cv.width,cv.height)*0.45*zoom/scale;
  const ca=Math.cos(rx),sa=Math.sin(rx),cb=Math.cos(ry),sb=Math.sin(ry);
  const pts=[];
  for(const c of CLOUDS)for(const p of c.pts){{
    let x=p[0]-cx,y=p[1]-cy,z=p[2]-cz;
    let x1=cb*x+sb*z, z1=-sb*x+cb*z;
    let y2=ca*y-sa*z1, z2=sa*y+ca*z1;
    pts.push([x1*s+cv.width/2, y2*s+cv.height/2, z2, c.color]);
  }}
  pts.sort((a,b)=>a[2]-b[2]);
  ctx.fillStyle="#111";ctx.fillRect(0,0,cv.width,cv.height);
  for(const [px,py,,col] of pts){{ctx.fillStyle=col;
    ctx.fillRect(px-1,py-1,2.4,2.4);}}
}}
let drag=null;
cv.onmousedown=e=>drag=[e.clientX,e.clientY];
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{{if(!drag)return;
  ry+=(e.clientX-drag[0])*0.01;rx+=(e.clientY-drag[1])*0.01;
  drag=[e.clientX,e.clientY];draw();}};
cv.onwheel=e=>{{zoom*=e.deltaY<0?1.1:0.9;draw();e.preventDefault();}};
window.onresize=draw;draw();
</script>
"""


def export_html(out_path: str, clouds, title: str = "cloudaae") -> None:
    """Self-contained interactive HTML point-cloud viewer (no network, no
    dependencies): orbit with the mouse, zoom with the wheel.  The
    TPU-host-friendly replacement for open3d's draw_geometries windows."""
    import json

    payload = []
    for pts, color, label in clouds:
        rgb = _COLOR_RGB.get(color, (127, 127, 127))
        payload.append(
            {
                "pts": np.asarray(pts, np.float32).round(5).tolist(),
                "color": "rgb(%d,%d,%d)" % rgb,
                "label": label,
            }
        )
    legend = " · ".join(
        f'<span style="color:rgb{_COLOR_RGB.get(c, (127, 127, 127))}">'
        f"{lab}</span>"
        for _, c, lab in clouds
    )
    with open(out_path, "w") as f:
        f.write(
            _HTML_VIEWER.format(
                title=title,
                legend=legend,
                clouds_json=json.dumps(payload),
            )
        )


def render_synth_sample(
    obj_models: np.ndarray,
    class_id: int,
    out_path: str,
    seed: int = 0,
) -> None:
    """Synthesize one sample and render its stages side by side.

    ``out_path`` extension picks the format: .png (matplotlib panels),
    .ply (colored cloud for any mesh viewer), or .html (self-contained
    interactive orbit viewer)."""
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
    if out_path.endswith(".ply") or out_path.endswith(".html"):
        clouds = [
            (np.asarray(posed), "green", "posed model"),
            (np.asarray(out["occluder"]), "blue", "occluder"),
            (np.asarray(out["input_points"]), "red", "network input"),
            (np.asarray(out["target_points"]), "C4", "recon target"),
        ]
        if out_path.endswith(".ply"):
            export_ply(out_path, clouds)
        else:
            export_html(out_path, clouds, title=f"synth class {class_id}")
        return
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
