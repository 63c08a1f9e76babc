"""LINEMOD section for RESULTS.md: converted-record eval of a trained run.

Real LINEMOD_preprocessed data is not present in this environment, so the
records are synthesized sim-to-sim with the exact converted-record schema
(linemod_to_tfrecord_small.py:189-249): per class, LINEMOD-frustum poses
(synth.sample_pose with the LINEMOD camera), the posed object model put
through hidden-point removal (the single-view self-occlusion the real
depth camera produces), sensor noise, and FPS to 512 points — then the
standard converted-record eval path (evaluate.evaluate_converted:
load -> FPS to num_point -> model -> ADD/ADD-S).  With a real
LINEMOD_preprocessed mount the same table regenerates from real frames
via `python -m cloudaae_tpu.data.linemod` + `--converted-records`.

    python scripts/eval_linemod.py --ckpt runs/13/6d/<stamp> \
        [--frames 50] [--icp] [--out runs/sections/linemod.md]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LINEMOD_CLASS_NAMES = [
    "ape", "benchvise", "camera", "can", "cat", "driller", "duck",
    "eggbox", "glue", "holepuncher", "iron", "lamp", "phone",
]


def _gate_note(cfg, args) -> str:
    """ICP-gate + head provenance sentence for the section header (ADVICE
    r4 #2: gated multi-start ICP deviates from the reference's
    unconditional refinement, evaluate_cloudAAE_ycbv.py:606-624 — readers
    must be able to tell gated from reference-style ICP columns)."""
    e = cfg.eval
    note = (
        f"  ICP gate: accept_gate={e.icp_accept_gate}, "
        f"centroid_start={e.icp_centroid_start}, "
        f"keep_frac={e.icp_gate_keep_frac} "
        "(gated multi-start; the reference applies ICP unconditionally)."
    )
    k = cfg.model.num_rot_hyp
    if k > 1:
        note += (
            f"  Rotation head: {k} hypotheses (selection: trimmed "
            f"alignment residual [hyp_residual_select="
            f"{e.hyp_residual_select}], depth-only, ICP-off and -on; "
            "docs/MULTIHYP.md)."
        )
    return note


def _gate_dict(cfg) -> dict:
    e = cfg.eval
    return {
        "icp_accept_gate": e.icp_accept_gate,
        "icp_centroid_start": e.icp_centroid_start,
        "icp_gate_keep_frac": e.icp_gate_keep_frac,
        "icp_iterations": e.icp_iterations,
        "num_rot_hyp": cfg.model.num_rot_hyp,
        "hyp_residual_select": cfg.eval.hyp_residual_select,
    }


def synth_records(obj_models, cfg, frames_per_class, seed, num_class):
    """Sim-to-sim converted records: posed model -> HPR visible -> noise
    -> FPS512, LINEMOD-frustum poses."""
    import jax
    import jax.numpy as jnp

    from cloudaae_tpu import so3
    from cloudaae_tpu.data.linemod import LinemodSample, NUM_POINT, np_fps
    from cloudaae_tpu.ops import hidden_point_removal
    from cloudaae_tpu.synth import sample_pose

    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    recs = []
    for cls in range(num_class):
        for frame in range(frames_per_class):
            key, k_pose, k_hpr = jax.random.split(key, 3)
            axag, rot, trans = sample_pose(k_pose, cfg.synth.camera)
            posed = so3.transform_points(
                jnp.asarray(obj_models[cls, :, :3]), rot, trans
            )
            vis, _, _ = hidden_point_removal(
                posed, 1024, k_hpr, cfg.synth.hpr_param,
                iters=cfg.synth.hpr_iters, slack=cfg.synth.hpr_slack,
            )
            pts = np.asarray(vis, np.float64)
            pts += rng.normal(scale=cfg.synth.noise_sigma, size=pts.shape)
            idx = np_fps(pts, NUM_POINT, rng)
            R = np.asarray(rot, np.float64)
            recs.append(
                LinemodSample(
                    class_id=cls,
                    frame_id=frame,
                    rotation_mat=R,
                    axisangle=np.asarray(axag, np.float64),
                    translation=np.asarray(trans, np.float64),
                    num_valid_points_in_segment=len(pts),
                    xyz=pts[idx],
                    rgb=np.full((NUM_POINT, 3), 0.5),
                    data_source=1,
                )
            )
    return recs


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="LINEMOD run dir / ckpt / params npz")
    p.add_argument("--frames", type=int, default=50)
    p.add_argument("--icp", nargs="?", const="on", default="off",
                   choices=["off", "on", "both"],
                   help="'both' evaluates the same records through the "
                        "ICP-off and ICP-on forwards (paired columns)")
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--sym-metric", action="store_true",
                   help="report the min-over-symmetry-group geodesic "
                        "(rot-sym) next to the single-GT rot — without it "
                        "the rot column is meaningless for symmetric "
                        "stand-in classes (cloudaae_tpu/symmetry.py)")
    p.add_argument("--sym-view", action="store_true",
                   help="extend the symmetry groups with depth-view-"
                        "equivalent flips (symmetry.detect_view_symmetries)")
    p.add_argument("--data-root", default="/root/reference")
    p.add_argument("--object-models", default=None,
                   help="object-model tfrecord (default: the run config's "
                        "table — the YCB stand-in models for sim-to-sim)")
    p.add_argument("--out", default=None,
                   help="markdown section output path")
    args = p.parse_args()

    import jax

    from cloudaae_tpu import checkpoint
    from cloudaae_tpu.config import config_from_run_dir
    from cloudaae_tpu.data import load_object_models
    from cloudaae_tpu.evaluate import evaluate_converted
    from cloudaae_tpu.models import make_model
    from cloudaae_tpu.parallel.train_step import create_train_state

    run_dir = args.ckpt
    if not os.path.isfile(os.path.join(run_dir, "config.json")):
        run_dir = os.path.dirname(os.path.abspath(args.ckpt.rstrip("/")))
    cfg = config_from_run_dir(run_dir)
    assert cfg.synth.dataset == "linemod", "not a LINEMOD run"

    obj_models_full = load_object_models(
        args.object_models or cfg.data.object_model_path
    )
    obj_models = obj_models_full[: cfg.model.num_class]
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    state = checkpoint.restore_any(args.ckpt, state)
    step = int(state.step)
    print(f"evaluating LINEMOD run at step {step}", flush=True)

    sym_rots = None
    if args.sym_metric:
        from cloudaae_tpu import symmetry

        # detect on the FULL stand-in model table and slice: the train-time
        # sym loss caches the full-set table (train_step builds it before
        # class slicing), so eval hits the same cache entry
        sym_rots = symmetry.build_symmetry_table_cached(
            np.asarray(obj_models_full[..., :3], np.float32),
            max_syms=32 if args.sym_view else 16,
            view_sym=args.sym_view,
        )[: cfg.model.num_class]
        _sym_counts = symmetry.num_symmetries(sym_rots)
        print("symmetry group sizes:",
              {c: int(_sym_counts[c]) for c in range(cfg.model.num_class)},
              flush=True)

    recs = synth_records(obj_models, cfg, args.frames, args.seed,
                         cfg.model.num_class)
    icp_arg = {"off": False, "on": True, "both": "both"}[args.icp]
    rows = []
    for cls in range(cfg.model.num_class):
        res = evaluate_converted(
            [r for r in recs if r.class_id == cls],
            state, model, cfg, obj_models, icp=icp_arg, sym_rots=sym_rots,
        )
        res, res_icp = res if args.icp == "both" else (res, None)
        rows.append((cls, res, res_icp))
        rot_lbl = "rot-sym" if args.sym_metric else "rot"
        icp_str = (
            f"  |  ICP: trans {res_icp.trans_err*100:.2f}cm "
            f"{rot_lbl} {np.degrees(res_icp.axag_sym_err):.1f}deg "
            f"ADD {res_icp.add*100:.2f}cm ADD<0.1d {res_icp.add_01d:.2f}"
            if res_icp is not None else ""
        )
        sym_str = (f" rot-sym {np.degrees(res.axag_sym_err):.1f}deg"
                   if args.sym_metric else "")
        print(
            f"class {cls:2d} {LINEMOD_CLASS_NAMES[cls]:12s} "
            f"frames {res.frames:3d} trans {res.trans_err*100:.2f}cm "
            f"rot {np.degrees(res.axag_err):.1f}deg{sym_str} "
            f"ADD {res.add*100:.2f}cm ADD-S {res.add_s*100:.2f}cm "
            f"ADD<0.1d {res.add_01d:.2f} AUC-S {res.add_s_auc:.3f}"
            + icp_str,
            flush=True,
        )

    valid = [r for _, r, _ in rows if r.frames]
    valid_icp = [ri for _, r, ri in rows if r.frames and ri is not None]
    mean_icp = lambda f: float(np.mean([f(r) for r in valid_icp]))

    def _num(x):
        x = float(x)
        return x if np.isfinite(x) else None

    def res_dict(r):
        return {
            "frames": r.frames, "trans_cm": _num(r.trans_err * 100),
            "rot_deg": _num(np.degrees(r.axag_err)),
            "rot_sym_deg": _num(np.degrees(r.axag_sym_err)),
            "add_cm": _num(r.add * 100), "add_s_cm": _num(r.add_s * 100),
            "add_01d": _num(r.add_01d), "add_s_01d": _num(r.add_s_01d),
            "add_auc": _num(r.add_auc), "add_s_auc": _num(r.add_s_auc),
        }

    mean = lambda f: float(np.mean([f(r) for r in valid]))
    out = args.out or "runs/sections/linemod.md"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("# LINEMOD — converted-record eval (sim-to-sim)\n\n")
        f.write(
            f"Checkpoint: `{args.ckpt}` (step {step}).  Protocol: "
            f"{args.frames} synthesized single-view FPS512 records per "
            "class (LINEMOD frustum poses, HPR self-occlusion, sensor "
            "noise; real LINEMOD_preprocessed is not mounted — object "
            "models are the 13-class stand-in table from the run config), "
            "evaluated through evaluate.evaluate_converted — the identical "
            "path real converted records take.  ICP: "
            f"{'paired off/on columns (same records)' if args.icp == 'both' else args.icp}."
            f"{_gate_note(cfg, args)}\n\n"
        )
        if sym_rots is not None:
            counts = [int(c) for c in _sym_counts]
            sym_cls = [f"{c} {LINEMOD_CLASS_NAMES[c]} ({counts[c]})"
                       for c in range(cfg.model.num_class) if counts[c] > 1]
            if sym_cls:
                f.write(
                    "Caveat: single-GT ADD / ADD<0.1d are metric-blind on "
                    "SYMMETRIC stand-in geometries — the flips the "
                    "symmetry-aware loss correctly forgives dominate the "
                    "column.  Symmetric stand-ins (group size): "
                    + ", ".join(sym_cls)
                    + ".  rot-sym and the ADD-S family (AUC-S) are the "
                    "meaningful columns for those rows; plain ADD is "
                    "meaningful only for the asymmetric stand-ins.\n\n"
                )
        sym_hdr = " rot-sym (deg) |" if args.sym_metric else ""
        rot_icp_lbl = "rot-sym+ICP" if args.sym_metric else "rot+ICP"
        icp_hdr = (f" trans+ICP | {rot_icp_lbl} | ADD+ICP | ADD<0.1d+ICP |"
                   " AUC-S+ICP |" if args.icp == "both" else "")
        f.write("| class | frames | trans (cm) | rot (deg) |" + sym_hdr +
                " ADD (cm) | ADD-S (cm) | ADD<0.1d | ADD-S<0.1d |"
                " AUC | AUC-S |" + icp_hdr + "\n")
        f.write("|---|---|---|---|" + ("---|" if args.sym_metric else "") +
                "---|---|---|---|---|---|" +
                ("---|---|---|---|---|" if args.icp == "both" else "") + "\n")
        for cls, r, ri in rows:
            sym_cell = (f" {np.degrees(r.axag_sym_err):.1f} |"
                        if args.sym_metric else "")
            icp_cell = (
                f" {ri.trans_err*100:.2f} | {np.degrees(ri.axag_sym_err):.1f} "
                f"| {ri.add*100:.2f} | {ri.add_01d:.2f} "
                f"| {ri.add_s_auc:.3f} |"
                if ri is not None else ""
            )
            f.write(
                f"| {cls} {LINEMOD_CLASS_NAMES[cls]} | {r.frames} "
                f"| {r.trans_err*100:.2f} | {np.degrees(r.axag_err):.1f} |"
                f"{sym_cell}"
                f" {r.add*100:.2f} | {r.add_s*100:.2f} "
                f"| {r.add_01d:.2f} | {r.add_s_01d:.2f} "
                f"| {r.add_auc:.3f} | {r.add_s_auc:.3f} |" + icp_cell + "\n"
            )
        sym_mean = (
            f" **{np.degrees(mean(lambda r: r.axag_sym_err)):.1f}** |"
            if args.sym_metric else ""
        )
        icp_mean = (
            f" **{mean_icp(lambda r: r.trans_err)*100:.2f}** "
            f"| **{np.degrees(mean_icp(lambda r: r.axag_sym_err)):.1f}** "
            f"| **{mean_icp(lambda r: r.add)*100:.2f}** "
            f"| **{mean_icp(lambda r: r.add_01d):.2f}** "
            f"| **{mean_icp(lambda r: r.add_s_auc):.3f}** |"
            if args.icp == "both" else ""
        )
        f.write(
            f"| **mean** | | **{mean(lambda r: r.trans_err)*100:.2f}** "
            f"| **{np.degrees(mean(lambda r: r.axag_err)):.1f}** |"
            f"{sym_mean}"
            f" **{mean(lambda r: r.add)*100:.2f}** "
            f"| **{mean(lambda r: r.add_s)*100:.2f}** "
            f"| **{mean(lambda r: r.add_01d):.2f}** "
            f"| **{mean(lambda r: r.add_s_01d):.2f}** "
            f"| **{mean(lambda r: r.add_auc):.3f}** "
            f"| **{mean(lambda r: r.add_s_auc):.3f}** |" + icp_mean + "\n"
        )
    with open(os.path.splitext(out)[0] + ".json", "w") as jf:
        json.dump(
            {
                "ckpt": args.ckpt, "step": step, "icp": args.icp,
                "frames_per_class": args.frames,
                "sym_metric": args.sym_metric, "sym_view": args.sym_view,
                "eval_gate": _gate_dict(cfg),
                "classes": {
                    str(cls): {
                        "name": LINEMOD_CLASS_NAMES[cls],
                        "icp_off": res_dict(r),
                        **({"icp_on": res_dict(ri)} if ri is not None else {}),
                    }
                    for cls, r, ri in rows
                },
            },
            jf, indent=1,
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
