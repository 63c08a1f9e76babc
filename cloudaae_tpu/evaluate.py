"""Evaluation entry point — the equivalent of ``evaluate_cloudAAE_ycbv.py``.

    python -m cloudaae_tpu.evaluate --trained-model <run>/ckpt \\
        --data-dir <dir with {seq:04d}_pcnn.tfrecord> --target-cls 0

Pipeline parity (SURVEY.md §3.2) with every host py_func moved on device:
depth -> cloud backprojection, per-object segment masking, mean-distance
filter (0.2 m), radius outlier removal (100 pts / 2 cm, keep-all fallback
under 512 inliers), FPS to N points, quat -> axis-angle, model forward,
recon FPS, chamfer vs the clean HPR segment, translation/geodesic errors —
one jitted program per frame batch over fixed-capacity padded buffers.

Beyond the reference's printed trans/axag losses (:649-656), this reports
ADD / ADD-S and their <2 cm and <0.1-diameter accuracies (the paper's
headline metrics), and optional on-device ICP refinement
(ops.icp, replacing open3d registration_icp :606-642).

Modes:
  real data:   --data-dir with pcnn tfrecords (per-class sequences from
               config.YCB_VALID_SEQ_ID, or --sequences to override)
  synthetic:   --synthetic N evaluates on N on-device synthesized frames
               (no external data needed; uses data.ycb_real.render_frame)
"""

from __future__ import annotations

import argparse
import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cloudaae_tpu import checkpoint, so3
from cloudaae_tpu.config import Config, EvalConfig, YCB_VALID_SEQ_ID
from cloudaae_tpu.data import load_object_models
from cloudaae_tpu.data import ycb_real
from cloudaae_tpu.models import make_model
from cloudaae_tpu.ops import (
    farthest_point_sample,
    gather_point,
    hidden_point_removal,
    icp_point_to_point,
    nn_distance,
    chamfer_loss,
    radius_outlier_mask,
)
from cloudaae_tpu.parallel.train_step import create_train_state

SEG_CAPACITY = 4096  # fixed capacity for one object's segment point budget


def backproject(depth_m: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Depth image (H, W) meters -> (H*W, 3) cloud.

    Mirrors ``get_pointcloud`` (evaluate_cloudAAE_ycbv.py:164-178).
    """
    h, w = depth_m.shape
    xs = jnp.arange(w, dtype=depth_m.dtype)
    ys = jnp.arange(h, dtype=depth_m.dtype)
    X, Y = jnp.meshgrid(xs, ys)
    x = (X - cx) * depth_m / fx
    y = (Y - cy) * depth_m / fy
    return jnp.stack([x, y, depth_m], axis=-1).reshape(-1, 3)


def compact(points: jnp.ndarray, mask: jnp.ndarray, capacity: int):
    """Select masked rows into a fixed-capacity buffer (order-preserving).

    When more than ``capacity`` rows are masked, the selection decimates
    evenly across the masked set (every count/capacity-th point in index
    order) instead of truncating — raster-order truncation would keep only
    the top image rows of a large object segment, a spatially catastrophic
    bias for pose estimation.
    """
    n = mask.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    total = jnp.sum(mask).astype(jnp.int32)
    # rank of each masked row among masked rows; keep rank r iff
    # floor(r*capacity/total) advances -> exactly `capacity` evenly-spaced
    # survivors when total > capacity
    rank = (jnp.cumsum(mask) - 1).astype(jnp.int32)
    c = jnp.maximum(total, 1)
    advances = (rank * capacity) // c > ((rank - 1) * capacity) // c
    mask = mask & jnp.where(total > capacity, advances, True)
    order = jnp.argsort(jnp.where(mask, iota, iota + n)).astype(jnp.int32)
    take = order[:capacity]
    count = jnp.minimum(jnp.sum(mask), capacity).astype(jnp.int32)
    out_mask = jnp.arange(capacity) < count
    return points[take], out_mask, count


@functools.partial(jax.jit, static_argnames=("num_point", "cfg"))
def eval_preprocess(
    depth_u16: jnp.ndarray,
    label_u8: jnp.ndarray,
    cls: jnp.ndarray,
    intrin: jnp.ndarray,  # (5,) fx fy cx cy factor_depth
    key: jax.Array,
    num_point: int,
    cfg: EvalConfig,
):
    """Frame -> fixed-size object segment, fully on device.

    Replicates create_tfrecord_dataset's per-segment chain
    (evaluate_cloudAAE_ycbv.py:310-322).
    Returns dict with xyz_inlier (num_point, 3), xyz (num_point, 3),
    segment (SEG_CAPACITY, 3) + seg_mask, counts and the validity flag.
    """
    fx, fy, cx, cy, factor = (intrin[i] for i in range(5))
    depth_m = depth_u16.astype(jnp.float32) / factor
    xyz = backproject(depth_m, fx, fy, cx, cy)
    labels = label_u8.reshape(-1).astype(jnp.int32)
    valid_depth = depth_u16.reshape(-1) > 0

    # label mask is 1-based (evaluate_cloudAAE_ycbv.py:263)
    m = (labels == cls + 1) & valid_depth
    # mean-distance filter (:219-223)
    cnt = jnp.maximum(jnp.sum(m), 1)
    mean = jnp.sum(jnp.where(m[:, None], xyz, 0.0), axis=0) / cnt
    dist = jnp.linalg.norm(xyz - mean, axis=-1)
    m2 = m & (dist <= cfg.segment_distance_threshold)
    num_after_filter = jnp.sum(m2)

    seg, seg_mask, seg_count = compact(xyz, m2, SEG_CAPACITY)

    # radius outlier removal (:250-258) with the keep-all fallback when
    # fewer than outlier_min_inliers survive (:256-257)
    inlier = radius_outlier_mask(
        seg, cfg.outlier_nb_points, cfg.outlier_radius, mask=seg_mask
    )
    inlier = jnp.where(
        jnp.sum(inlier) < cfg.outlier_min_inliers, seg_mask, inlier
    )
    num_inlier = jnp.sum(inlier)

    k1, k2 = jax.random.split(key)
    idx_inlier = farthest_point_sample(num_point, seg, key=k1, mask=inlier)
    idx_all = farthest_point_sample(num_point, seg, key=k2, mask=seg_mask)
    return {
        "xyz_inlier": seg[idx_inlier],
        "xyz": seg[idx_all],
        "segment": seg,
        "seg_mask": seg_mask,
        "num_after_filter": num_after_filter,
        "num_inlier": num_inlier,
        "ok": (num_after_filter > cfg.min_points_after_filter)
        & (num_inlier >= cfg.min_valid_points),
    }


def make_eval_forward(model, cfg: Config, obj_models: np.ndarray, icp: bool,
                      jit: bool = True, sym_rots: np.ndarray | None = None):
    """Per-sample eval: segment -> pose + losses + ADD/ADD-S.

    ``sym_rots``: optional (C, S, 3, 3) per-class symmetry table
    (cloudaae_tpu/symmetry.py); when given, ``axag_sym_err`` is the
    min-over-group geodesic (the meaningful rotation metric for symmetric
    classes), else it equals the plain ``axag_err``.
    """
    obj_models_np = np.asarray(obj_models[..., :3], np.float32)
    sym_rots_np = None if sym_rots is None else np.asarray(sym_rots, np.float32)

    def fwd(variables, segment, seg_full, seg_full_mask, cls, quat, trans_gt, key):
        # segment: (N, 3) FPS-sampled inlier points (graph input, :423-434)
        axag_gt = so3.quat_to_axag(quat)
        R_gt = so3.exp_map(axag_gt)

        onehot = jax.nn.one_hot(cls, cfg.model.num_class)
        net_in = jnp.concatenate(
            [
                segment - jnp.mean(segment, axis=0),
                jnp.broadcast_to(onehot, (segment.shape[0], cfg.model.num_class)),
            ],
            axis=-1,
        )[None]
        mean = jnp.mean(segment, axis=0)
        recon_res, rot_pred, trans_res, _ = model.apply(variables, net_in)
        recon = recon_res[0] + mean
        trans_pred = trans_res[0] + mean
        model_pts = jnp.asarray(obj_models_np)[cls]
        k_hyp = cfg.model.num_rot_hyp
        if k_hyp > 1:
            # multi-hypothesis head: pick ONE hypothesis before any metric.
            # Selector: the trimmed model->segment alignment residual (the
            # same depth-only evidence that gates refinement;
            # EvalConfig.hyp_residual_select, on in the ICP-off path too).
            # Measured against the alternatives on the 5 ambiguity classes
            # (runs/analyze_hyps_r5c.json; docs/MULTIHYP.md): it beats the
            # trained confidence (near-uniform) and edges the segment->
            # model direction (ops.icp.hypothesis_residual); on frames
            # where the view genuinely does not determine the mode no
            # selector can do better (the hypothesis oracle caps it).
            # The trained confidence head is the fallback selector when
            # residual selection is disabled (and the only one in
            # infer.Predictor, which may not have object models).
            hyps, conf = so3.split_hypotheses(
                rot_pred[0], cfg.model.rot_rep_dim, k_hyp
            )
            R_all = so3.head_to_mat(hyps, cfg.model.rot_rep)  # (k, 3, 3)
            if cfg.eval.hyp_residual_select or (icp and cfg.eval.icp_accept_gate):
                from cloudaae_tpu.ops.icp import alignment_residual

                res_h = jax.vmap(
                    lambda Rh: alignment_residual(
                        model_pts, seg_full, Rh, trans_pred,
                        segment_mask=seg_full_mask,
                        keep_frac=cfg.eval.icp_gate_keep_frac,
                    )
                )(R_all)
                sel = jnp.argmin(res_h)
            else:
                sel = jnp.argmax(conf)
            R_pred = R_all[sel]
        else:
            R_pred = so3.head_to_mat(rot_pred[0], cfg.model.rot_rep)
        # report axis-angle regardless of head representation (the
        # reference's output convention, evaluate_cloudAAE_ycbv.py:571-603)
        rot_axag = (rot_pred[0]
                    if cfg.model.rot_rep == "axag" and k_hyp == 1
                    else so3.log_map(R_pred)[0])

        # recon FPS to N (reference :450) and chamfer vs the clean HPR
        # visible segment of the gt-posed model (:328-332,430-432,452)
        posed_gt = so3.transform_points(model_pts, R_gt, trans_gt)
        clean_vis, _, _ = hidden_point_removal(
            posed_gt, cfg.synth.num_input_points, key, cfg.synth.hpr_param,
            iters=cfg.synth.hpr_iters, slack=cfg.synth.hpr_slack,
        )
        recon_fps = gather_point(
            recon[None], farthest_point_sample(cfg.synth.num_input_points, recon)[None]
        )[0]
        xyz_loss, _ = chamfer_loss(recon_fps, clean_vis)

        trans_err = jnp.linalg.norm(trans_pred - trans_gt)
        axag_err = so3.geodesic_angle(R_pred, R_gt)

        if icp:
            from cloudaae_tpu.ops.icp import alignment_residual

            def refine(R0, t0):
                return icp_point_to_point(
                    model_pts, seg_full, R0, t0,
                    stages=cfg.eval.icp_iterations,
                    initial_radius=cfg.eval.icp_initial_radius,
                    radius_decay=cfg.eval.icp_radius_decay,
                    segment_mask=seg_full_mask,
                )

            R_ref, t_ref = refine(R_pred, trans_pred)
            if not cfg.eval.icp_accept_gate:
                R_pred, trans_pred = R_ref, t_ref  # reference behavior
            else:
                # candidate poses, judged by the trimmed alignment
                # residual: the network pose, its ICP refinement, and
                # (icp_centroid_start) a centroid-snapped translation
                # start + its refinement — ICP can slide into a worse
                # local optimum on thin/ambiguous segments, and gross
                # axial shifts of stick objects need the snapped restart
                cands = [(R_pred, trans_pred), (R_ref, t_ref)]
                if cfg.eval.icp_centroid_start:
                    from cloudaae_tpu.ops.hpr import hpr_visible_mask

                    posed_pred = so3.transform_points(
                        model_pts, R_pred, trans_pred
                    )
                    vis = hpr_visible_mask(
                        posed_pred, cfg.synth.hpr_param,
                        iters=cfg.synth.hpr_iters,
                        slack=cfg.synth.hpr_slack,
                    )
                    nvis = jnp.maximum(jnp.sum(vis), 1)
                    vis_centroid = (
                        jnp.sum(jnp.where(vis[:, None], posed_pred, 0.0), 0)
                        / nvis
                    )
                    nseg = jnp.maximum(jnp.sum(seg_full_mask), 1)
                    seg_centroid = (
                        jnp.sum(
                            jnp.where(seg_full_mask[:, None], seg_full, 0.0), 0
                        )
                        / nseg
                    )
                    t_snap = trans_pred + seg_centroid - vis_centroid
                    cands.append((R_pred, t_snap))
                    cands.append(refine(R_pred, t_snap))
                res = jnp.stack(
                    [
                        alignment_residual(
                            model_pts, seg_full, Rc, tc,
                            segment_mask=seg_full_mask,
                            keep_frac=cfg.eval.icp_gate_keep_frac,
                        )
                        for Rc, tc in cands
                    ]
                )
                best = jnp.argmin(res)
                R_pred = jnp.stack([c[0] for c in cands])[best]
                trans_pred = jnp.stack([c[1] for c in cands])[best]
            trans_err = jnp.linalg.norm(trans_pred - trans_gt)
            axag_err = so3.geodesic_angle(R_pred, R_gt)

        if sym_rots_np is not None:
            syms = jnp.asarray(sym_rots_np)[cls]  # (S, 3, 3)
            R_equiv = jnp.einsum(
                "ij,sjk->sik", R_gt, syms, precision="highest"
            )
            axag_sym_err = jnp.min(so3.geodesic_angle(R_pred[None], R_equiv))
        else:
            axag_sym_err = axag_err

        # ADD / ADD-S on the full model cloud
        pred_pts = so3.transform_points(model_pts, R_pred, trans_pred)
        add = jnp.mean(jnp.linalg.norm(pred_pts - posed_gt, axis=-1))
        d1, _, _, _ = nn_distance(pred_pts, posed_gt)
        # nn_distance returns squared distances via the -2xy expansion,
        # which can dip epsilon-negative — clamp before the sqrt
        add_s = jnp.mean(jnp.sqrt(jnp.maximum(d1, 0.0)))
        diameter = jnp.max(
            jnp.linalg.norm(
                model_pts[None, :, :] - model_pts[:, None, :], axis=-1
            )
        )
        return {
            "trans_err": trans_err,
            "axag_err": axag_err,
            "axag_sym_err": axag_sym_err,
            "xyz_loss": xyz_loss,
            "add": add,
            "add_s": add_s,
            "diameter": diameter,
            "rot_pred": rot_axag,
            "trans_pred": trans_pred,
        }

    return jax.jit(fwd) if jit else fwd


def _icp_modes(icp) -> tuple[bool, ...]:
    """Validate the ``icp`` tri-state: False / True / "both".

    Any other string (e.g. "off", "Both") would silently bool() to a
    single ICP-on pass, inverting the caller's intent.
    """
    if icp == "both":
        return (False, True)
    if isinstance(icp, bool):
        return (icp,)
    raise ValueError(f"icp must be False, True, or 'both'; got {icp!r}")


@dataclass
class EvalResult:
    frames: int
    trans_err: float
    axag_err: float
    add: float
    add_s: float
    add_2cm: float
    add_s_2cm: float
    add_01d: float
    add_s_01d: float
    # min-over-symmetry-group geodesic (== axag_err when no table given)
    axag_sym_err: float = float("nan")
    # Area under the accuracy-vs-threshold curve for thresholds 0..10 cm —
    # the YCB-Video protocol of PoseCNN (Xiang et al., RSS 2018), the
    # metric the reference's paper tables use (README.md:63-75 citation).
    # Closed form: AUC = E[max(0, 1 - d / 0.1)].
    add_auc: float = float("nan")
    add_s_auc: float = float("nan")


def evaluate_frames(
    frames,
    target_cls: int,
    state,
    model,
    cfg: Config,
    obj_models: np.ndarray,
    icp: bool = False,
    verbose: bool = True,
    sym_rots: np.ndarray | None = None,
) -> EvalResult:
    """Run the full eval over an iterable of RealFrame for one class."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = make_eval_forward(model, cfg, obj_models, icp, sym_rots=sym_rots)
    key = jax.random.key(0)
    acc: dict[str, list] = {k: [] for k in
                            ("trans_err", "axag_err", "axag_sym_err",
                             "add", "add_s", "diam")}
    n_skipped = 0
    for frame in frames:
        if not frame.class_one_hot[target_cls]:
            continue
        key, k1, k2 = jax.random.split(key, 3)
        pre = eval_preprocess(
            jnp.asarray(frame.depth),
            jnp.asarray(frame.label),
            jnp.asarray(target_cls),
            jnp.asarray(
                [frame.fx, frame.fy, frame.cx, frame.cy, frame.factor_depth],
                jnp.float32,
            ),
            k1,
            cfg.eval.num_point,
            cfg.eval,
        )
        if not bool(pre["ok"]):
            n_skipped += 1
            continue
        out = fwd(
            variables,
            pre["xyz_inlier"],
            pre["segment"],
            pre["seg_mask"],
            jnp.asarray(target_cls),
            jnp.asarray(frame.quaternions[target_cls]),
            jnp.asarray(frame.translations[target_cls]),
            k2,
        )
        out = jax.device_get(out)
        acc["trans_err"].append(float(out["trans_err"]))
        acc["axag_err"].append(float(out["axag_err"]))
        acc["axag_sym_err"].append(float(out["axag_sym_err"]))
        acc["add"].append(float(out["add"]))
        acc["add_s"].append(float(out["add_s"]))
        acc["diam"].append(float(out["diameter"]))
        if verbose:
            print(
                f"class {target_cls} seq {frame.seq_id} frame {frame.frame_id} "
                f"trans_loss {out['trans_err']:.6f} rot_loss {out['axag_err']:.6f} "
                f"ADD {out['add']:.6f} ADD-S {out['add_s']:.6f}",
                flush=True,
            )
    return _result_from_acc(acc)


def _result_from_acc(acc: dict) -> EvalResult:
    """Aggregate per-frame accumulators into an EvalResult."""
    n = len(acc["trans_err"])
    if n == 0:
        return EvalResult(0, float("nan"), float("nan"), float("nan"),
                          float("nan"), 0.0, 0.0, 0.0, 0.0)
    add = np.asarray(acc["add"])
    add_s = np.asarray(acc["add_s"])
    diam = np.asarray(acc["diam"])
    thr = 0.02
    auc_max = 0.1  # 10 cm, the PoseCNN/YCB-Video AUC range
    return EvalResult(
        frames=n,
        trans_err=float(np.mean(acc["trans_err"])),
        axag_err=float(np.mean(acc["axag_err"])),
        add=float(np.mean(add)),
        add_s=float(np.mean(add_s)),
        add_2cm=float(np.mean(add < thr)),
        add_s_2cm=float(np.mean(add_s < thr)),
        add_01d=float(np.mean(add < 0.1 * diam)),
        add_s_01d=float(np.mean(add_s < 0.1 * diam)),
        axag_sym_err=float(np.mean(acc["axag_sym_err"])),
        add_auc=float(np.mean(np.maximum(0.0, 1.0 - add / auc_max))),
        add_s_auc=float(np.mean(np.maximum(0.0, 1.0 - add_s / auc_max))),
    )


def evaluate_frames_batched(
    frames: list,
    target_cls: int,
    state,
    model,
    cfg: Config,
    obj_models: np.ndarray,
    icp: bool | str = False,
    chunk: int = 16,
    sym_rots: np.ndarray | None = None,
) -> EvalResult | tuple[EvalResult, EvalResult]:
    """Batched evaluation: frames are stacked and processed in vmapped
    chunks — one device program per chunk instead of two dispatches per
    frame (per-dispatch round trips dominate on tunneled backends).

    Same pipeline and results as :func:`evaluate_frames`; frames whose
    segment fails the validity gates are dropped from the averages exactly
    as the reference's dataset filters drop them
    (evaluate_cloudAAE_ycbv.py:318-322).

    ``frames`` may be any iterable (a generator streams frame decode
    against device compute); only one chunk is materialized at a time.

    ``icp`` may be ``False``/``True`` or the string ``"both"``: "both"
    runs the ICP-off and ICP-on forwards over the SAME preprocessed
    frames (shared renders, shared segment extraction, shared RNG) and
    returns an ``(off, on)`` tuple — the paired-column ablation protocol
    (the reference treats ICP as its accuracy lever,
    evaluate_cloudAAE_ycbv.py:606-642).
    """
    import itertools

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    icp_modes = _icp_modes(icp)

    frame_iter = (f for f in frames if f.class_one_hot[target_cls])

    pre_batch = jax.jit(
        jax.vmap(
            lambda d, l, intr, k: eval_preprocess(
                d, l, jnp.asarray(target_cls), intr, k,
                cfg.eval.num_point, cfg.eval,
            )
        ),
        static_argnums=(),
    )
    fwd_batches = []
    for mode in icp_modes:
        fwd_raw = make_eval_forward(model, cfg, obj_models, mode, jit=False,
                                    sym_rots=sym_rots)
        fwd_batches.append(jax.jit(
            jax.vmap(
                lambda seg, full, fmask, quat, tgt, k, _f=fwd_raw: _f(
                    variables, seg, full, fmask, jnp.asarray(target_cls),
                    quat, tgt, k,
                )
            )
        ))

    accs = [
        {k: [] for k in ("trans_err", "axag_err", "axag_sym_err",
                         "add", "add_s", "diam")}
        for _ in icp_modes
    ]
    key = jax.random.key(0)
    while True:
        fs = list(itertools.islice(frame_iter, chunk))
        if not fs:
            break
        depth = jnp.asarray(np.stack([f.depth for f in fs]))
        label = jnp.asarray(np.stack([f.label for f in fs]))
        intr = jnp.asarray(
            np.stack(
                [[f.fx, f.fy, f.cx, f.cy, f.factor_depth] for f in fs]
            ).astype(np.float32)
        )
        quat = jnp.asarray(
            np.stack([f.quaternions[target_cls] for f in fs]).astype(np.float32)
        )
        tgt = jnp.asarray(
            np.stack([f.translations[target_cls] for f in fs]).astype(np.float32)
        )
        key, k1, k2 = jax.random.split(key, 3)
        pre = pre_batch(depth, label, intr, jax.random.split(k1, len(fs)))
        ok = np.asarray(pre["ok"])
        for acc, fwd_batch in zip(accs, fwd_batches):
            out = fwd_batch(
                pre["xyz_inlier"], pre["segment"], pre["seg_mask"],
                quat, tgt, jax.random.split(k2, len(fs)),
            )
            host = jax.device_get(out)
            for i in range(len(fs)):
                if not ok[i]:
                    continue
                acc["trans_err"].append(float(host["trans_err"][i]))
                acc["axag_err"].append(float(host["axag_err"][i]))
                acc["axag_sym_err"].append(float(host["axag_sym_err"][i]))
                acc["add"].append(float(host["add"][i]))
                acc["add_s"].append(float(host["add_s"][i]))
                acc["diam"].append(float(host["diameter"][i]))

    results = [_result_from_acc(a) for a in accs]
    return tuple(results) if icp == "both" else results[0]


def evaluate_converted(
    samples,
    state,
    model,
    cfg: Config,
    obj_models: np.ndarray,
    icp: bool | str = False,
    chunk: int = 64,
    sym_rots: np.ndarray | None = None,
) -> EvalResult | tuple[EvalResult, EvalResult]:
    """Evaluate converted FPS512 records (data.linemod.load_converted).

    The LINEMOD analogue of :func:`evaluate_frames_batched` — the eval
    protocol of ``evaluate_cloudAAE_ycbv.py:649-656`` applied to the
    converter's output records (linemod_to_tfrecord_small.py:189-249):
    each record already carries a camera-frame FPS512 segment + GT pose, so
    the pipeline is FPS to ``cfg.eval.num_point`` -> model forward ->
    trans/geodesic errors + ADD/ADD-S vs the class object model (+ optional
    on-device ICP against the full 512-point segment).

    ``obj_models`` must use the record's class-id space — for LINEMOD, the
    13-class table from ``data.linemod.convert_object_models``.

    ``icp="both"`` shares the record decode + FPS across an ICP-off and an
    ICP-on forward and returns an ``(off, on)`` tuple, as in
    :func:`evaluate_frames_batched`.
    """
    import itertools

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    icp_modes = _icp_modes(icp)
    num_point = cfg.eval.num_point

    fwd_batches = []
    for mode in icp_modes:
        fwd_raw = make_eval_forward(model, cfg, obj_models, mode, jit=False,
                                    sym_rots=sym_rots)

        def one(xyz, cls, axag_gt, trans_gt, key, _f=fwd_raw):
            k1, k2 = jax.random.split(key)
            idx = farthest_point_sample(num_point, xyz, key=k1)
            full_mask = jnp.ones(xyz.shape[0], bool)
            quat = so3.axag_to_quat(axag_gt)
            return _f(variables, xyz[idx], xyz, full_mask, cls, quat,
                      trans_gt, k2)

        fwd_batches.append(jax.jit(jax.vmap(one)))

    accs = [
        {k: [] for k in ("trans_err", "axag_err", "axag_sym_err",
                         "add", "add_s", "diam")}
        for _ in icp_modes
    ]
    key = jax.random.key(0)
    it = iter(samples)
    while True:
        ss = list(itertools.islice(it, chunk))
        if not ss:
            break
        xyz = jnp.asarray(np.stack([s.xyz for s in ss]).astype(np.float32))
        cls = jnp.asarray(np.asarray([s.class_id for s in ss], np.int32))
        axag = jnp.asarray(
            np.stack([s.axisangle for s in ss]).astype(np.float32)
        )
        tgt = jnp.asarray(
            np.stack([s.translation for s in ss]).astype(np.float32)
        )
        key, k = jax.random.split(key)
        for acc, fwd_batch in zip(accs, fwd_batches):
            host = jax.device_get(
                fwd_batch(xyz, cls, axag, tgt, jax.random.split(k, len(ss)))
            )
            acc["trans_err"].extend(np.asarray(host["trans_err"], float))
            acc["axag_err"].extend(np.asarray(host["axag_err"], float))
            acc["axag_sym_err"].extend(np.asarray(host["axag_sym_err"], float))
            acc["add"].extend(np.asarray(host["add"], float))
            acc["add_s"].extend(np.asarray(host["add_s"], float))
            acc["diam"].extend(np.asarray(host["diameter"], float))
    results = [_result_from_acc(a) for a in accs]
    return tuple(results) if icp == "both" else results[0]


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    general = p.add_argument_group("general")
    general.add_argument("--model", default=None,
                         help="model preset override; by default the run "
                              "dir's archived config.json decides (falls "
                              "back to dgcnn_mean_6d when none exists)")
    general.add_argument("--num-point", type=int, default=None,
                         help="segment size fed to the network; defaults "
                              "to the trained model's num_point")
    general.add_argument("--target-cls", type=int, default=9)
    general.add_argument("--trained-model", required=False, default=None,
                         help="checkpoint dir (orbax) to evaluate")
    general.add_argument("--data-root", default="/root/reference")
    general.add_argument("--data-dir", default=None,
                         help="directory with {seq:04d}_pcnn.tfrecord files")
    general.add_argument("--sequences", type=int, nargs="*", default=None)
    general.add_argument("--converted-records", nargs="*", default=None,
                         help="converted FPS512 tfrecords "
                              "(data.linemod converter output); evaluates "
                              "per class over all given files")
    general.add_argument("--object-models", default=None,
                         help="object-model tfrecord override (e.g. the "
                              "13-class LINEMOD table from "
                              "data.linemod.convert_object_models); "
                              "default: the YCB table under --data-root")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--icp", action="store_true")
    p.add_argument("--sym-metric", action="store_true",
                   help="report axag_sym_err as the min-over-symmetry-group "
                        "geodesic (cloudaae_tpu/symmetry.py) — the "
                        "meaningful rotation metric for symmetric classes")
    p.add_argument("--sym-view", action="store_true",
                   help="with --sym-metric: extend the groups with depth-"
                        "view-equivalent rotations "
                        "(symmetry.detect_view_symmetries)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="evaluate on N rendered synthetic frames instead "
                        "of real tfrecords")
    p.add_argument("--per-frame", action="store_true",
                   help="one device dispatch per frame with the reference's "
                        "per-frame loss prints (evaluate_cloudAAE_ycbv.py:"
                        "562-568) instead of the batched default")
    p.add_argument("--chunk", type=int, default=16,
                   help="frames per device program in the batched path")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    # rebuild the trained model's exact config (rot_rep, dtype, ...) from
    # the run dir's archived config.json when evaluating a checkpoint
    run_dir = ""
    if args.trained_model:
        tm = os.path.abspath(args.trained_model.rstrip("/"))
        # accept the run dir itself, its ckpt/ dir, or a params npz
        run_dir = (tm if os.path.isfile(os.path.join(tm, "config.json"))
                   else os.path.dirname(tm))
    model_name = args.model
    if run_dir and os.path.exists(os.path.join(run_dir, "config.json")):
        from cloudaae_tpu.config import config_from_run_dir

        cfg = config_from_run_dir(run_dir)
        # the archived config already names the trained architecture; only
        # an explicit CLI --model overrides it (never the CLI default)
    else:
        cfg = Config()
        model_name = model_name or "dgcnn_mean_6d"
    # the eval segment size must match the trained decoder width; an
    # explicit --num-point overrides (e.g. plain-AE variants)
    import dataclasses

    num_point = args.num_point or cfg.model.num_point
    cfg = dataclasses.replace(
        cfg,
        eval=dataclasses.replace(
            cfg.eval, num_point=num_point,
            min_valid_points=min(cfg.eval.min_valid_points, num_point),
        ),
    )
    obj_models = load_object_models(
        args.object_models
        or os.path.join(
            args.data_root, "object_model_tfrecord/obj_models.tfrecords"
        )
    )
    model = make_model(cfg.model, name=model_name)
    state = create_train_state(model, cfg, jax.random.key(0))
    if args.trained_model:
        state = checkpoint.restore_any(args.trained_model, state)
        print(f"restored {args.trained_model} at step {int(state.step)}")

    sym_rots = None
    if args.sym_metric:
        from cloudaae_tpu import symmetry

        sym_rots = symmetry.build_symmetry_table_cached(
            np.asarray(obj_models[..., :3], np.float32),
            max_syms=32 if args.sym_view else 16,
            view_sym=args.sym_view,
        )

    if args.converted_records:
        from cloudaae_tpu.data import linemod

        by_cls: dict[int, list] = {}
        for path in args.converted_records:
            for s in linemod.load_converted(path):
                by_cls.setdefault(s.class_id, []).append(s)
        results: dict[int, EvalResult] = {}
        for cls in sorted(by_cls):
            res = evaluate_converted(
                by_cls[cls], state, model, cfg, obj_models,
                icp=args.icp, chunk=args.chunk, sym_rots=sym_rots,
            )
            results[cls] = res
            sym_str = (f" axag_sym {res.axag_sym_err:.6f}"
                       if args.sym_metric else "")
            print(
                f"class {cls:2d} frames {res.frames:4d} "
                f"trans_loss {res.trans_err:.6f} axag_loss {res.axag_err:.6f}"
                f"{sym_str} "
                f"ADD {res.add:.6f} ADD-S {res.add_s:.6f} "
                f"ADD<0.1d {res.add_01d:.3f} ADD-S<0.1d {res.add_s_01d:.3f}"
            )
        valid = [r for r in results.values() if r.frames]
        if valid:
            print(
                f"mean over {len(valid)} classes: "
                f"trans_loss {np.mean([r.trans_err for r in valid]):.6f} "
                f"axag_loss {np.mean([r.axag_err for r in valid]):.6f} "
                f"ADD<0.1d {np.mean([r.add_01d for r in valid]):.3f} "
                f"ADD-S<0.1d {np.mean([r.add_s_01d for r in valid]):.3f}"
            )
        return results

    if args.synthetic:
        rng = np.random.default_rng(0)
        frames = []
        for i in range(args.synthetic):
            from scipy.spatial.transform import Rotation

            R = Rotation.random(random_state=rng).as_matrix()
            t = np.array(
                [rng.normal(0, 0.04), rng.normal(0, 0.04), rng.uniform(0.6, 0.9)]
            )
            frames.append(
                ycb_real.render_frame(
                    obj_models, [args.target_cls], R[None], t[None],
                    seq_id=0, frame_id=i,
                )
            )
    else:
        seqs = args.sequences or YCB_VALID_SEQ_ID[args.target_cls]
        data_dir = args.data_dir or os.path.join(
            args.data_root, "ycb_video_data_tfRecords"
        )
        paths = [os.path.join(data_dir, f"{s:04d}_pcnn.tfrecord") for s in seqs]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            raise FileNotFoundError(
                f"no pcnn tfrecords for class {args.target_cls} under {data_dir}"
            )

        def frame_iter():
            for path in paths:
                yield from ycb_real.iter_real_frames(path, cfg.model.num_class)

        frames = frame_iter()

    if args.per_frame:
        result = evaluate_frames(
            frames, args.target_cls, state, model, cfg, obj_models,
            icp=args.icp, sym_rots=sym_rots,
        )
    else:
        result = evaluate_frames_batched(
            frames, args.target_cls, state, model, cfg, obj_models,
            icp=args.icp, chunk=args.chunk, sym_rots=sym_rots,
        )
    print(
        f"frames {result.frames} trans_loss {result.trans_err:.6f} "
        f"axag_loss {result.axag_err:.6f}"
    )
    print(
        f"ADD {result.add:.6f} ADD-S {result.add_s:.6f} "
        f"ADD<2cm {result.add_2cm:.3f} ADD-S<2cm {result.add_s_2cm:.3f} "
        f"ADD<0.1d {result.add_01d:.3f} ADD-S<0.1d {result.add_s_01d:.3f} "
        f"AUC {result.add_auc:.3f} AUC-S {result.add_s_auc:.3f}"
    )
    return result


if __name__ == "__main__":
    main()
