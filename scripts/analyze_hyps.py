"""Did the k hypotheses specialize, and does the selector find the good one?

Separates the two failure modes of the multi-hypothesis head
(docs/MULTIHYP.md) per class, on the same uniform-pose frames the probe
eval renders:

  * ORACLE error: min over hypotheses of the sym-geodesic to GT — low
    oracle + high selected == a SELECTION problem (the confidence head or
    residual cannot find the mode); high oracle == a SPECIALIZATION
    problem (hypotheses collapsed / never split for this class);
  * spread: mean pairwise geodesic among the k hypotheses;
  * confidence stats: softmax entropy, and whether argmax tracks the
    oracle winner;
  * residual selection: the trimmed model->segment alignment residual
    (ops.icp.alignment_residual) scored per hypothesis — the ICP-gate
    selector, evaluable without refinement.

    python scripts/analyze_hyps.py --ckpt <run_or_npz> --cls 10 13 16 20
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
    p.add_argument("--cls", type=int, nargs="*", default=[10, 13, 16, 17, 20])
    p.add_argument("--frames", type=int, default=50)
    p.add_argument("--out", default=None)
    p.add_argument("--data-root", default="/root/reference")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cloudaae_tpu import checkpoint, so3, symmetry
    from cloudaae_tpu.config import YCB_CLASS_NAMES, config_from_run_dir, Config
    from cloudaae_tpu.data import load_object_models, ycb_real
    from cloudaae_tpu.evaluate import eval_preprocess
    from cloudaae_tpu.models import make_model
    from cloudaae_tpu.ops.icp import alignment_residual
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
    k = cfg.model.num_rot_hyp

    sym_all = symmetry.build_symmetry_table_cached(
        np.asarray(obj_models[..., :3], np.float32), max_syms=32, view_sym=True
    )

    @jax.jit
    def forward(segment, seg_full, seg_full_mask, cls):
        mean = jnp.mean(segment, axis=0)
        onehot = jax.nn.one_hot(cls, cfg.model.num_class)
        net_in = jnp.concatenate(
            [segment - mean,
             jnp.broadcast_to(onehot, (segment.shape[0], cfg.model.num_class))],
            axis=-1,
        )[None]
        _, rot_pred, trans_res, _ = model.apply(variables, net_in)
        hyps, conf = so3.split_hypotheses(rot_pred[0], cfg.model.rot_rep_dim, k)
        R_all = so3.head_to_mat(hyps, cfg.model.rot_rep)          # (k, 3, 3)
        t_pred = trans_res[0] + mean
        mdl = jnp.asarray(obj_models[..., :3], jnp.float32)[cls]
        res = jax.vmap(
            lambda Rh: alignment_residual(
                mdl, seg_full, Rh, t_pred,
                segment_mask=seg_full_mask,
                keep_frac=cfg.eval.icp_gate_keep_frac,
            )
        )(R_all)
        # segment->model squared nn distances per hypothesis (the
        # flip-discriminating direction: every OBSERVED point must lie on
        # the hypothesized surface; no hidden-half trim needed)
        def seg_sq(Rh):
            moved = jnp.matmul(mdl, Rh.T, precision=jax.lax.Precision.HIGHEST) + t_pred
            d = (
                jnp.sum(seg_full**2, axis=-1, keepdims=True)
                - 2.0 * jnp.matmul(seg_full, moved.T,
                                   precision=jax.lax.Precision.HIGHEST)
                + jnp.sum(moved**2, axis=-1)[None, :]
            )
            return jnp.maximum(jnp.min(d, axis=-1), 0.0)          # (S,)

        seg_d = jax.vmap(seg_sq)(R_all)                           # (k, S)
        return R_all, jax.nn.softmax(conf), res, seg_d, t_pred

    report = {}
    for cls in args.cls:
        R_u, t_u = uniform_eval_poses(cfg.synth.camera, cls, args.frames)
        sym = jnp.asarray(sym_all[cls])
        rng = np.random.default_rng(1000 + cls)
        key = jax.random.key(0)
        oracle, sel_conf, sel_res, ent, spread, agree = [], [], [], [], [], []
        sel_segres, raw = [], []
        for i in range(args.frames):
            R_gt = R_u[i].astype(np.float32)
            frame = ycb_real.render_frame(
                obj_models, [cls], R_gt[None], t_u[i].astype(np.float32)[None],
                frame_id=i, rng=rng, depth_noise=0.002,
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
            R_all, conf, res, seg_d, _ = jax.device_get(forward(
                pre["xyz_inlier"], pre["segment"], pre["seg_mask"],
                jnp.asarray(cls),
            ))
            mask = np.asarray(jax.device_get(pre["seg_mask"]), bool)
            seg_res = np.zeros(k)
            for h in range(k):
                dv = np.sort(seg_d[h][mask])
                k90 = max(int(0.9 * len(dv)), 1)
                seg_res[h] = float(dv[:k90].mean())
            # sym-geodesic of every hypothesis to GT
            R_equiv = np.einsum("ij,sjk->sik", R_gt, np.asarray(sym))
            th = np.zeros(k)
            for h in range(k):
                cosv = np.clip(
                    (np.einsum("sii->s",
                               np.einsum("ij,skj->sik", R_all[h], R_equiv))
                     - 1) / 2, -1, 1)
                th[h] = np.degrees(np.min(np.arccos(cosv)))
            oracle.append(th.min())
            sel_conf.append(th[int(np.argmax(conf))])
            sel_res.append(th[int(np.argmin(res))])
            sel_segres.append(th[int(np.argmin(seg_res))])
            raw.append({"th": th.tolist(), "conf": np.asarray(conf, float).tolist(),
                        "res": np.asarray(res, float).tolist(),
                        "segres": seg_res.tolist()})
            pc = conf / conf.sum()
            ent.append(float(-(pc * np.log(np.maximum(pc, 1e-9))).sum()))
            agree.append(int(np.argmax(conf) == int(np.argmin(th))))
            pair = []
            for a in range(k):
                for b in range(a + 1, k):
                    c = np.clip((np.trace(R_all[a] @ R_all[b].T) - 1) / 2, -1, 1)
                    pair.append(np.degrees(np.arccos(c)))
            spread.append(float(np.mean(pair)))
        report[YCB_CLASS_NAMES[cls]] = {
            "frames": len(oracle),
            "oracle_deg": round(float(np.mean(oracle)), 1),
            "conf_selected_deg": round(float(np.mean(sel_conf)), 1),
            "residual_selected_deg": round(float(np.mean(sel_res)), 1),
            "segres_selected_deg": round(float(np.mean(sel_segres)), 1),
            "conf_entropy_mean": round(float(np.mean(ent)), 2),
            "conf_picks_oracle_frac": round(float(np.mean(agree)), 2),
            "hyp_pairwise_spread_deg": round(float(np.mean(spread)), 1),
            "frames_raw": raw,
        }
        print(YCB_CLASS_NAMES[cls], json.dumps(report[YCB_CLASS_NAMES[cls]]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"ckpt": args.ckpt, "k": k, "classes": report}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
