"""Evaluate a trained checkpoint on synthetic rendered frames and write
RESULTS.md — the round's accuracy evidence.

    python scripts/eval_trained.py --ckpt runs/21/6d/<stamp>/ckpt \\
        [--classes 0 5 9 13] [--frames 25] [--icp]

Uses the z-buffer renderer (data.ycb_real.render_frame) as the frame
source since the real YCB test tfrecords are a separate download absent
from this environment (BASELINE.md).  The pipeline exercised is the full
real-data path: depth image -> backprojection -> masking -> outlier
removal -> FPS -> model -> ADD/ADD-S (+ optional ICP).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def uniform_eval_poses(camera, cls: int, frames: int, margin_px: float = 48.0):
    """The eval 'uniform' pose source — the SAME frustum sampler the
    --generate-poses training distribution draws from (synth.sample_pose,
    per-dataset camera): uniform SO(3) rotations, Gaussian-in-frustum
    translations.  One sampler shared by train (train.generate_pose_table),
    the pose sweep, and eval; pinned by tests/test_pose_table.py.

    Draws whose center projects outside the *render* camera's image
    (data.ycb_real.DEFAULT_INTRINSICS — a narrower FOV than the frustum
    sampler's reprojection-check camera, which uses the reference's
    LINEMOD intrinsics for both datasets) are redrawn: the eval protocol
    only ever sees objects visible in the frame, exactly as the
    reference's real test frames do by construction.

    Returns (R (frames, 3, 3), t (frames, 3)) float64 arrays.
    """
    import jax

    from cloudaae_tpu.data.ycb_real import DEFAULT_INTRINSICS, FRAME_H, FRAME_W
    from cloudaae_tpu.synth import sample_pose

    fx, fy = DEFAULT_INTRINSICS["fx"], DEFAULT_INTRINSICS["fy"]
    cx, cy = DEFAULT_INTRINSICS["cx"], DEFAULT_INTRINSICS["cy"]
    key = jax.random.key(1000 + cls)
    Rs, ts = [], []
    while len(Rs) < frames:
        key, k = jax.random.split(key)
        _, R, t = sample_pose(k, camera)
        t = np.asarray(t, np.float64)
        u = fx * t[0] / t[2] + cx
        v = fy * t[1] / t[2] + cy
        if not (margin_px < u < FRAME_W - margin_px
                and margin_px < v < FRAME_H - margin_px):
            continue
        Rs.append(np.asarray(R, np.float64))
        ts.append(t)
    return np.stack(Rs), np.stack(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--classes", type=int, nargs="*",
                   default=[0, 2, 4, 5, 9, 13, 15, 19])
    p.add_argument("--frames", type=int, default=25)
    p.add_argument("--icp", nargs="?", const="on", default="off",
                   choices=["off", "on", "both"],
                   help="'both' runs ICP-off and ICP-on over the SAME "
                        "rendered frames and writes a paired-column table "
                        "(the ICP ablation the reference treats as its "
                        "accuracy lever, evaluate_cloudAAE_ycbv.py:606-642)")
    p.add_argument("--out", default="RESULTS.md")
    p.add_argument("--data-root", default="/root/reference")
    p.add_argument("--pose-source", choices=["records", "uniform"],
                   default="records",
                   help="'records' draws eval poses from the class's shipped "
                        "pose prior (the reference's protocol: test poses "
                        "share the training scenes' pose distribution); "
                        "'uniform' samples SO(3) uniformly (out of prior)")
    p.add_argument("--sym-metric", action="store_true",
                   help="also report the min-over-symmetry-group geodesic "
                        "rotation error (cloudaae_tpu/symmetry.py) — the "
                        "meaningful rotation metric for symmetric classes")
    p.add_argument("--sym-view", action="store_true",
                   help="with --sym-metric: extend the groups with depth-"
                        "view-equivalent rotations the camera cannot "
                        "resolve (symmetry.detect_view_symmetries) — e.g. "
                        "a can's top-bottom flip")
    args = p.parse_args()

    import jax
    from scipy.spatial.transform import Rotation

    from cloudaae_tpu import checkpoint
    from cloudaae_tpu.config import Config, YCB_CLASS_NAMES, config_from_run_dir
    from cloudaae_tpu.data import load_object_models, ycb_real
    from cloudaae_tpu.data import tfrecord
    from cloudaae_tpu.evaluate import evaluate_frames_batched
    from cloudaae_tpu.models import make_model
    from cloudaae_tpu.parallel.train_step import create_train_state

    # rebuild the exact trained model (rot_rep, dtype, ...) from the run
    # dir's archived config.json (ckpt dirs live at <run_dir>/ckpt)
    run_dir = os.path.dirname(os.path.abspath(args.ckpt.rstrip("/")))
    if os.path.exists(os.path.join(run_dir, "config.json")):
        cfg = config_from_run_dir(run_dir)
        print(f"config from {run_dir}/config.json "
              f"(rot_rep={cfg.model.rot_rep})", flush=True)
    else:
        cfg = Config()
    obj_models = load_object_models(
        os.path.join(args.data_root, "object_model_tfrecord/obj_models.tfrecords")
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    state = checkpoint.restore_any(args.ckpt, state)
    step = int(state.step)
    print(f"evaluating checkpoint at step {step}", flush=True)

    sym_rots = None
    if args.sym_metric:
        from cloudaae_tpu import symmetry

        sym_rots = symmetry.build_symmetry_table_cached(
            np.asarray(obj_models[..., :3], np.float32),
            max_syms=32 if args.sym_view else 16,
            view_sym=args.sym_view,
        )
        counts = symmetry.num_symmetries(sym_rots)
        print("symmetry group sizes:",
              {c: int(counts[c]) for c in args.classes}, flush=True)

    def record_poses(cls: int) -> tuple[np.ndarray, np.ndarray]:
        """All (axisangle, translation) pose records for one class."""
        path = os.path.join(
            args.data_root,
            f"ycb_video_data_tfRecords/train_syn/{cls}_syn.tfrecords",
        )
        ax, tr = [], []
        for payload in tfrecord.iter_tfrecord(path):
            ex = tfrecord.parse_example(payload)
            ax.append(ex["axisangle"].float_list)
            tr.append(ex["translation"].float_list)
        return np.stack(ax), np.stack(tr)

    rows = []
    for cls in args.classes:
        rng = np.random.default_rng(1000 + cls)
        if args.pose_source == "records":
            ax_all, tr_all = record_poses(cls)
            pick = rng.choice(len(ax_all), size=args.frames, replace=False)
        else:
            R_u, t_u = uniform_eval_poses(cfg.synth.camera, cls, args.frames)
        frames = []
        for i in range(args.frames):
            if args.pose_source == "records":
                R = Rotation.from_rotvec(ax_all[pick[i]]).as_matrix()
                t = tr_all[pick[i]].astype(np.float64)
            else:
                R, t = R_u[i], t_u[i]
            frames.append(
                ycb_real.render_frame(
                    obj_models, [cls], R[None], t[None], frame_id=i,
                    rng=rng, depth_noise=0.002,
                )
            )
        icp_arg = {"off": False, "on": True, "both": "both"}[args.icp]
        res = evaluate_frames_batched(
            frames, cls, state, model, cfg, obj_models, icp=icp_arg,
            sym_rots=sym_rots,
        )
        res, res_icp = res if args.icp == "both" else (res, None)
        rows.append((cls, res, res_icp))
        sym_str = (f" rot-sym {np.degrees(res.axag_sym_err):.1f}deg"
                   if args.sym_metric else "")
        icp_str = (
            f"  |  ICP: trans {res_icp.trans_err*100:.2f}cm "
            f"{'rot-sym' if args.sym_metric else 'rot'} "
            f"{np.degrees(res_icp.axag_sym_err):.1f}deg "
            f"ADD {res_icp.add*100:.2f}cm ADD-S {res_icp.add_s*100:.2f}cm"
            if res_icp is not None else ""
        )
        print(
            f"class {cls:2d} {YCB_CLASS_NAMES[cls]:24s} frames {res.frames:3d} "
            f"trans {res.trans_err*100:.2f}cm rot {np.degrees(res.axag_err):.1f}deg"
            f"{sym_str} "
            f"ADD {res.add*100:.2f}cm ADD-S {res.add_s*100:.2f}cm "
            f"ADD<2cm {res.add_2cm:.2f} ADD-S<2cm {res.add_s_2cm:.2f}"
            f"{icp_str}",
            flush=True,
        )

    def _num(x):
        # zero-frame classes carry NaN metrics; json.dump would emit the
        # non-standard `NaN` token that strict parsers reject — use null
        x = float(x)
        return x if np.isfinite(x) else None

    def res_dict(r):
        return {
            "frames": r.frames, "trans_cm": _num(r.trans_err * 100),
            "rot_deg": _num(np.degrees(r.axag_err)),
            "rot_sym_deg": _num(np.degrees(r.axag_sym_err)),
            "add_cm": _num(r.add * 100), "add_s_cm": _num(r.add_s * 100),
            "add_2cm": _num(r.add_2cm), "add_s_2cm": _num(r.add_s_2cm),
            "add_01d": _num(r.add_01d), "add_s_01d": _num(r.add_s_01d),
            "add_auc": _num(r.add_auc), "add_s_auc": _num(r.add_s_auc),
        }

    # ICP-gate + head provenance (ADVICE r4 #2: the gated multi-start ICP
    # deviates from the reference's unconditional refinement — artifacts
    # must say which protocol produced the '+ICP' columns)
    eval_gate = {
        "icp_accept_gate": cfg.eval.icp_accept_gate,
        "icp_centroid_start": cfg.eval.icp_centroid_start,
        "icp_gate_keep_frac": cfg.eval.icp_gate_keep_frac,
        "icp_iterations": cfg.eval.icp_iterations,
        "num_rot_hyp": cfg.model.num_rot_hyp,
        "hyp_residual_select": cfg.eval.hyp_residual_select,
    }

    # machine-readable dump next to the markdown (repro_results consumers)
    with open(os.path.splitext(args.out)[0] + ".json", "w") as jf:
        json.dump(
            {
                "ckpt": args.ckpt, "step": step,
                "pose_source": args.pose_source, "icp": args.icp,
                "frames_per_class": args.frames,
                "sym_metric": args.sym_metric, "sym_view": args.sym_view,
                "eval_gate": eval_gate,
                "classes": {
                    str(cls): {
                        "name": YCB_CLASS_NAMES[cls],
                        "icp_off": res_dict(r),
                        **({"icp_on": res_dict(ri)} if ri is not None else {}),
                    }
                    for cls, r, ri in rows
                },
            },
            jf, indent=1,
        )

    valid = [r for _, r, _ in rows if r.frames > 0]
    valid_icp = [ri for _, r, ri in rows if r.frames > 0 and ri is not None]
    mean = lambda f: float(np.mean([f(r) for r in valid]))
    mean_icp = lambda f: float(np.mean([f(r) for r in valid_icp]))
    with open(args.out, "w") as f:
        f.write("# Round results — trained checkpoint evaluation\n\n")
        f.write(
            f"Checkpoint: `{args.ckpt}` (step {step}, "
            f"{step * 128 / 381553:.1f} epochs of the 90-epoch reference "
            f"recipe)\n\n"
        )
        pose_note = (
            "poses drawn from the class's shipped pose records (the "
            "training pose prior — the reference's own eval protocol keeps "
            "test poses in the real-scene pose distribution)"
            if args.pose_source == "records"
            else "uniformly random SO(3) poses (out of the record-pose prior "
            "— the capability the reference's fixed 381k-record table "
            "cannot express, train_cloudAAE_ycbv.py:177)"
        )
        gate_note = (
            f"  ICP gate: accept_gate={cfg.eval.icp_accept_gate}, "
            f"centroid_start={cfg.eval.icp_centroid_start}, "
            f"keep_frac={cfg.eval.icp_gate_keep_frac} "
            "(gated multi-start; the reference applies ICP "
            "unconditionally)."
        )
        if cfg.model.num_rot_hyp > 1:
            gate_note += (
                f"  Rotation head: {cfg.model.num_rot_hyp} hypotheses "
                "(selection: trimmed alignment residual "
                f"[hyp_residual_select={cfg.eval.hyp_residual_select}], "
                "depth-only, ICP-off and -on; docs/MULTIHYP.md)."
            )
        f.write(
            f"Protocol: full real-data eval pipeline on {args.frames} "
            "z-buffer-rendered frames per class (depth noise sigma 2 mm); "
            f"{pose_note}. ICP: "
            f"{'paired off/on columns (same frames)' if args.icp == 'both' else args.icp}."
            f"{gate_note}"
            "\n\n"
        )
        sym_hdr = " rot-sym (deg) |" if args.sym_metric else ""
        # without --sym-metric, axag_sym_err falls back to the plain
        # geodesic — label the paired column accordingly
        rot_icp_lbl = "rot-sym+ICP" if args.sym_metric else "rot+ICP"
        icp_hdr = (
            f" trans+ICP | {rot_icp_lbl} | ADD+ICP | ADD-S+ICP |"
            " ADD-S<2cm+ICP | AUC-S+ICP |" if args.icp == "both" else ""
        )
        f.write("| class | frames | trans (cm) | rot (deg) |" + sym_hdr +
                " ADD (cm) | "
                "ADD-S (cm) | ADD<2cm | ADD-S<2cm | ADD<0.1d | ADD-S<0.1d |"
                " AUC | AUC-S |" + icp_hdr + "\n")
        f.write("|---|---|---|---|" + ("---|" if args.sym_metric else "") +
                "---|---|---|---|---|---|---|---|" +
                ("---|---|---|---|---|---|" if args.icp == "both" else "") +
                "\n")
        for cls, r, ri in rows:
            sym_cell = (f" {np.degrees(r.axag_sym_err):.1f} |"
                        if args.sym_metric else "")
            icp_cell = (
                f" {ri.trans_err*100:.2f} | {np.degrees(ri.axag_sym_err):.1f} "
                f"| {ri.add*100:.2f} | {ri.add_s*100:.2f} "
                f"| {ri.add_s_2cm:.2f} | {ri.add_s_auc:.3f} |"
                if ri is not None else ""
            )
            f.write(
                f"| {cls} {YCB_CLASS_NAMES[cls]} | {r.frames} "
                f"| {r.trans_err*100:.2f} | {np.degrees(r.axag_err):.1f} |"
                f"{sym_cell}"
                f" {r.add*100:.2f} | {r.add_s*100:.2f} "
                f"| {r.add_2cm:.2f} | {r.add_s_2cm:.2f} "
                f"| {r.add_01d:.2f} | {r.add_s_01d:.2f} "
                f"| {r.add_auc:.3f} | {r.add_s_auc:.3f} |"
                f"{icp_cell}\n"
            )
        sym_mean = (
            f" **{np.degrees(mean(lambda r: r.axag_sym_err)):.1f}** |"
            if args.sym_metric else ""
        )
        icp_mean = (
            f" **{mean_icp(lambda r: r.trans_err)*100:.2f}** "
            f"| **{np.degrees(mean_icp(lambda r: r.axag_sym_err)):.1f}** "
            f"| **{mean_icp(lambda r: r.add)*100:.2f}** "
            f"| **{mean_icp(lambda r: r.add_s)*100:.2f}** "
            f"| **{mean_icp(lambda r: r.add_s_2cm):.2f}** "
            f"| **{mean_icp(lambda r: r.add_s_auc):.3f}** |"
            if args.icp == "both" else ""
        )
        f.write(
            f"| **mean** | | **{mean(lambda r: r.trans_err)*100:.2f}** "
            f"| **{np.degrees(mean(lambda r: r.axag_err)):.1f}** |"
            f"{sym_mean}"
            f" **{mean(lambda r: r.add)*100:.2f}** "
            f"| **{mean(lambda r: r.add_s)*100:.2f}** "
            f"| **{mean(lambda r: r.add_2cm):.2f}** "
            f"| **{mean(lambda r: r.add_s_2cm):.2f}** "
            f"| **{mean(lambda r: r.add_01d):.2f}** "
            f"| **{mean(lambda r: r.add_s_01d):.2f}** "
            f"| **{mean(lambda r: r.add_auc):.3f}** "
            f"| **{mean(lambda r: r.add_s_auc):.3f}** |"
            f"{icp_mean}\n"
        )
        f.write(
            "\nNotes: rot (deg) is the geodesic angle to the single "
            "annotated GT pose; for symmetric objects (cans 0/5, "
            "wood_block 15, clamp 19, box 180-deg flips) it counts "
            "symmetry-equivalent poses as errors, so ADD-S and rot-sym are "
            "the meaningful metrics there (PoseCNN/YCB protocol). '+ICP' "
            "columns are the same frames refined by the on-device ICP "
            "(cloudaae_tpu/ops/icp.py). Frames are "
            "densified z-buffer renders with hidden-surface culling "
            "(data/ycb_real.py render_frame) — without densification a "
            "2048-point splat render leaks ~55% back-surface pixels and "
            "is not a valid stand-in for sensor depth.\n"
        )
    print(f"wrote {args.out}")
    print(json.dumps({"mean_add_cm": mean(lambda r: r.add) * 100}))


if __name__ == "__main__":
    main()
