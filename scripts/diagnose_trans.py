"""Per-frame translation-error diagnosis for one class (VERDICT r4 #3).

The methodology that cracked large_marker in round 4, committed as a
script and pointed at pitcher_base (class 10): render uniform-pose
frames, run the EXACT eval preprocessing + forward, and decompose each
frame's translation error into the quantities that separate the
candidate causes:

  * segment size / segment-mean offset  -> preprocessing starvation
    (the large_marker round-4 hypothesis — disproved there by these
    same numbers);
  * anchor distance |segment mean - t_gt| and its correlation with the
    error -> residual-head underfit (the head must regress the
    visible-surface-centroid-to-origin offset, which for a tall
    asymmetric object varies strongly with viewpoint);
  * error decomposition along the camera ray vs lateral, and along the
    GT-posed object axes -> depth ambiguity vs axial placement;
  * correlation with the (symmetry-aware) rotation error -> ambiguity
    coupling (a flipped handle hypothesis drags the regressed origin).

    python scripts/diagnose_trans.py --ckpt <run_or_npz> --cls 10 \
        [--frames 50] [--out runs/diagnose_pitcher.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--cls", type=int, default=10)
    p.add_argument("--frames", type=int, default=50)
    p.add_argument("--out", default=None)
    p.add_argument("--data-root", default="/root/reference")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cloudaae_tpu import checkpoint, so3
    from cloudaae_tpu.config import Config, YCB_CLASS_NAMES, config_from_run_dir
    from cloudaae_tpu.data import load_object_models, ycb_real
    from cloudaae_tpu.evaluate import eval_preprocess
    from cloudaae_tpu.models import make_model
    from cloudaae_tpu.parallel.train_step import create_train_state
    from eval_trained import uniform_eval_poses

    run_dir = args.ckpt
    if not os.path.isfile(os.path.join(run_dir, "config.json")):
        run_dir = os.path.dirname(os.path.abspath(args.ckpt.rstrip("/")))
    cfg = (config_from_run_dir(run_dir)
           if os.path.exists(os.path.join(run_dir, "config.json"))
           else Config())
    obj_models = load_object_models(os.path.join(
        args.data_root, "object_model_tfrecord/obj_models.tfrecords"
    ))
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    state = checkpoint.restore_any(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    from cloudaae_tpu import symmetry

    sym_rots = symmetry.build_symmetry_table_cached(
        np.asarray(obj_models[..., :3], np.float32),
        max_syms=32, view_sym=True,
    )[args.cls]

    cls = args.cls
    model_pts = np.asarray(obj_models[cls, :, :3], np.float32)
    R_u, t_u = uniform_eval_poses(cfg.synth.camera, cls, args.frames)

    @jax.jit
    def forward(segment):
        mean = jnp.mean(segment, axis=0)
        onehot = jax.nn.one_hot(cls, cfg.model.num_class)
        net_in = jnp.concatenate(
            [segment - mean,
             jnp.broadcast_to(onehot, (segment.shape[0], cfg.model.num_class))],
            axis=-1,
        )[None]
        _, rot_pred, trans_res, _ = model.apply(variables, net_in)
        k = cfg.model.num_rot_hyp
        hyps, conf = so3.split_hypotheses(
            rot_pred[0], cfg.model.rot_rep_dim, k
        )
        R_all = so3.head_to_mat(hyps, cfg.model.rot_rep)
        R = R_all[jnp.argmax(conf)]
        return R, trans_res[0] + mean, mean

    rng = np.random.default_rng(1000 + cls)
    rows = []
    key = jax.random.key(0)
    for i in range(args.frames):
        R_gt, t_gt = R_u[i].astype(np.float32), t_u[i].astype(np.float32)
        frame = ycb_real.render_frame(
            obj_models, [cls], R_gt[None], t_gt[None], frame_id=i,
            rng=rng, depth_noise=0.002,
        )
        key, k1 = jax.random.split(key)
        pre = eval_preprocess(
            jnp.asarray(frame.depth), jnp.asarray(frame.label),
            jnp.asarray(cls),
            jnp.asarray([frame.fx, frame.fy, frame.cx, frame.cy,
                         frame.factor_depth], jnp.float32),
            k1, cfg.eval.num_point, cfg.eval,
        )
        if not bool(pre["ok"]):
            continue
        R_pred, t_pred, seg_mean = jax.device_get(forward(pre["xyz_inlier"]))

        err_vec = np.asarray(t_pred) - t_gt                # camera frame
        ray = t_gt / max(np.linalg.norm(t_gt), 1e-9)
        err_depth = float(np.dot(err_vec, ray))            # along camera ray
        err_lat = float(np.linalg.norm(err_vec - err_depth * ray))
        err_obj = R_gt.T @ err_vec                         # object axes
        anchor = float(np.linalg.norm(np.asarray(seg_mean) - t_gt))
        R_equiv = np.einsum("ij,sjk->sik", R_gt, sym_rots)
        rot_sym = float(np.min([
            np.degrees(np.arccos(np.clip(
                (np.trace(np.asarray(R_pred) @ Re.T) - 1) / 2, -1, 1)))
            for Re in R_equiv
        ]))
        rows.append({
            "frame": i,
            "trans_err_cm": float(np.linalg.norm(err_vec)) * 100,
            "err_depth_cm": err_depth * 100,
            "err_lat_cm": err_lat * 100,
            "err_obj_x_cm": float(err_obj[0]) * 100,
            "err_obj_y_cm": float(err_obj[1]) * 100,
            "err_obj_z_cm": float(err_obj[2]) * 100,
            "anchor_cm": anchor * 100,
            "rot_sym_deg": rot_sym,
            "seg_px": int(pre["num_after_filter"]),
            "seg_inlier": int(pre["num_inlier"]),
            "gt_depth_m": float(t_gt[2]),
        })

    arr = lambda k: np.asarray([r[k] for r in rows])
    e = arr("trans_err_cm")

    def corr(a, b):
        a, b = np.asarray(a, float), np.asarray(b, float)
        if a.std() < 1e-9 or b.std() < 1e-9:
            return 0.0
        return float(np.corrcoef(a, b)[0, 1])

    summary = {
        "class": cls, "name": YCB_CLASS_NAMES[cls], "frames": len(rows),
        "ckpt": args.ckpt,
        "trans_err_cm": {
            "mean": float(e.mean()), "median": float(np.median(e)),
            "p90": float(np.percentile(e, 90)), "max": float(e.max()),
        },
        "decomposition_mean_abs_cm": {
            "depth": float(np.abs(arr("err_depth_cm")).mean()),
            "lateral": float(np.abs(arr("err_lat_cm")).mean()),
            "obj_x": float(np.abs(arr("err_obj_x_cm")).mean()),
            "obj_y": float(np.abs(arr("err_obj_y_cm")).mean()),
            "obj_z": float(np.abs(arr("err_obj_z_cm")).mean()),
        },
        "segment": {
            "px_mean": float(arr("seg_px").mean()),
            "px_min": float(arr("seg_px").min()),
            "anchor_cm_mean": float(arr("anchor_cm").mean()),
            "anchor_cm_std": float(arr("anchor_cm").std()),
        },
        "correlations_with_trans_err": {
            "rot_sym_deg": corr(e, arr("rot_sym_deg")),
            "anchor_cm": corr(e, arr("anchor_cm")),
            "seg_px": corr(e, arr("seg_px")),
            "gt_depth_m": corr(e, arr("gt_depth_m")),
        },
        "worst_5_frames": sorted(
            rows, key=lambda r: -r["trans_err_cm"]
        )[:5],
    }
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "frames": rows}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
