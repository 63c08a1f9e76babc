"""Pose-robustness sweep: rotation error vs distance from the pose prior.

Evaluates a trained checkpoint on ON-DEVICE SYNTHESIZED segments (the
training distribution itself — no render gap) with eval poses drawn from:

  * the shipped pose records, perturbed by a fixed geodesic angle
    (0 / 5 / 10 / 20 degrees), and
  * uniform SO(3) rotations (record translations), i.e. fully out of the
    record prior.

This is the maintained version of the round-1 perturbation sweep
(STATUS.md "Pose prior, not SO(3)"): the reference's fixed 381k pose
records (train_cloudAAE_ycbv.py:177) imprint a pose prior on the net, and
this sweep measures how far a checkpoint generalizes beyond it.  Run it on
a record-prior checkpoint and on a ``--generate-poses`` checkpoint to
compare:

    python scripts/pose_sweep.py --ckpt runs/21/6d/<stamp>/ckpt \
        [--classes 0 2 4 5 9 13 15 19] [--samples 1024] [--sym]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--classes", type=int, nargs="*",
                   default=[0, 2, 4, 5, 9, 13, 15, 19])
    p.add_argument("--samples", type=int, default=1024,
                   help="eval samples per pose source (batches of 128)")
    p.add_argument("--deltas", type=float, nargs="*", default=[0, 5, 10, 20],
                   help="perturbation angles in degrees")
    p.add_argument("--sym", action="store_true",
                   help="also report the min-over-symmetry-group geodesic")
    p.add_argument("--data-root", default="/root/reference")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--out", default=None,
                   help="optional markdown file to append the table to")
    args = p.parse_args()

    import dataclasses

    import jax
    from scipy.spatial.transform import Rotation

    from cloudaae_tpu import checkpoint
    from cloudaae_tpu.config import Config, config_from_run_dir
    from cloudaae_tpu.data import load_object_models, tfrecord
    from cloudaae_tpu.models import make_model
    from cloudaae_tpu.parallel.train_step import (
        create_train_state,
        make_eval_step,
    )

    run_dir = os.path.dirname(os.path.abspath(args.ckpt.rstrip("/")))
    if os.path.exists(os.path.join(run_dir, "config.json")):
        cfg = config_from_run_dir(run_dir)
        print(f"config from {run_dir}/config.json "
              f"(rot_rep={cfg.model.rot_rep})", flush=True)
    else:
        cfg = Config()
    if args.sym:
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, rot_sym=True)
        )
    obj_models = load_object_models(
        os.path.join(args.data_root,
                     "object_model_tfrecord/obj_models.tfrecords")
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    state = checkpoint.restore_any(args.ckpt, state)
    print(f"checkpoint step {int(state.step)}", flush=True)
    eval_step = make_eval_step(model, cfg, obj_models)

    # --- pose pool: all records of the chosen classes -------------------
    ax_pool, tr_pool, cls_pool = [], [], []
    for cls in args.classes:
        path = os.path.join(
            args.data_root,
            f"ycb_video_data_tfRecords/train_syn/{cls}_syn.tfrecords",
        )
        for payload in tfrecord.iter_tfrecord(path):
            ex = tfrecord.parse_example(payload)
            ax_pool.append(ex["axisangle"].float_list)
            tr_pool.append(ex["translation"].float_list)
            cls_pool.append(cls)
    ax_pool = np.asarray(ax_pool, np.float32)
    tr_pool = np.asarray(tr_pool, np.float32)
    cls_pool = np.asarray(cls_pool, np.int32)
    print(f"{len(ax_pool)} pose records across {len(args.classes)} classes",
          flush=True)

    rng = np.random.default_rng(args.seed)
    b = 128
    n_batches = max(1, args.samples // b)
    pick = rng.choice(len(ax_pool), size=n_batches * b, replace=False)

    def run(axisangle: np.ndarray, name: str) -> tuple[float, float]:
        rots, syms = [], []
        for i in range(n_batches):
            sl = slice(i * b, (i + 1) * b)
            batch = (
                tr_pool[pick][sl],
                axisangle[sl].astype(np.float32),
                cls_pool[pick][sl],
            )
            metrics, _ = eval_step(state, batch, jax.random.key(i))
            rots.append(float(metrics["axag_loss"]))
            if "axag_sym_loss" in metrics:
                syms.append(float(metrics["axag_sym_loss"]))
        rot = float(np.mean(rots))
        sym = float(np.mean(syms)) if syms else float("nan")
        sym_str = f"  rot-sym {np.degrees(sym):6.1f} deg" if syms else ""
        print(f"{name:>14s}: rot {np.degrees(rot):6.1f} deg{sym_str}",
              flush=True)
        return rot, sym

    results = []
    base = Rotation.from_rotvec(ax_pool[pick])
    for delta in args.deltas:
        if delta == 0:
            perturbed = base
        else:
            axes = rng.normal(size=(len(pick), 3))
            axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
            perturbed = Rotation.from_rotvec(
                axes * np.radians(delta)
            ) * base
        rot, sym = run(perturbed.as_rotvec().astype(np.float32),
                       f"records +{delta:g} deg")
        results.append((f"records +{delta:g}°", rot, sym))

    uniform = Rotation.random(len(pick), random_state=rng)
    rot, sym = run(uniform.as_rotvec().astype(np.float32), "uniform SO(3)")
    results.append(("uniform SO(3)", rot, sym))

    if args.out:
        with open(args.out, "a") as f:
            f.write(f"\n## Pose sweep — `{args.ckpt}` "
                    f"(step {int(state.step)})\n\n")
            f.write(f"{args.samples} synthesized samples/source, classes "
                    f"{args.classes}.\n\n")
            head = "| pose source | rot (deg) |"
            sep = "|---|---|"
            if args.sym:
                head += " rot-sym (deg) |"
                sep += "---|"
            f.write(head + "\n" + sep + "\n")
            for name, r, s in results:
                row = f"| {name} | {np.degrees(r):.1f} |"
                if args.sym:
                    row += f" {np.degrees(s):.1f} |"
                f.write(row + "\n")
        print(f"appended table to {args.out}", flush=True)


if __name__ == "__main__":
    main()
