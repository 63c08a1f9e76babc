"""Evaluation pipeline tests: renderer fixtures, preprocessing, full eval.

The real YCB test tfrecords are a separate download (BASELINE.md), so these
tests drive the identical pipeline on frames produced by the z-buffer
renderer (data.ycb_real.render_frame) — same schema, same decode path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cloudaae_tpu.config import Config
from cloudaae_tpu.data import ycb_real
from cloudaae_tpu.evaluate import (
    SEG_CAPACITY,
    backproject,
    eval_preprocess,
    evaluate_frames,
)
from cloudaae_tpu.models import make_model
from cloudaae_tpu.parallel.train_step import create_train_state
from cloudaae_tpu import so3


@pytest.fixture(scope="module")
def obj_models():
    rng = np.random.default_rng(0)
    models = []
    for i in range(21):
        d = rng.normal(size=(2048, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        radii = np.array([0.05, 0.04, 0.06]) * (0.8 + 0.02 * i)
        models.append(np.concatenate([d * radii, np.zeros((2048, 3))], axis=1))
    return np.stack(models).astype(np.float32)


def make_pose(rng):
    axag = rng.normal(size=3).astype(np.float32)
    R = np.asarray(so3.exp_map(jnp.asarray(axag)))
    t = np.array([rng.normal(0, 0.03), rng.normal(0, 0.03), rng.uniform(0.65, 0.8)],
                 np.float32)
    return axag, R, t


def test_render_write_parse_roundtrip(tmp_path, obj_models):
    rng = np.random.default_rng(1)
    _, R, t = make_pose(rng)
    frame = ycb_real.render_frame(obj_models, [3], R[None], t[None],
                                  seq_id=48, frame_id=7)
    assert frame.depth.shape == (480, 640)
    assert (frame.label == 4).sum() > 200  # 1-based labels
    assert frame.class_one_hot[3] == 1

    path = str(tmp_path / "0048_pcnn.tfrecord")
    n = ycb_real.write_sequence(path, [frame, frame])
    assert n == 2
    back = list(ycb_real.iter_real_frames(path))
    assert len(back) == 2
    assert np.array_equal(back[0].depth, frame.depth)
    assert np.array_equal(back[0].label, frame.label)
    assert np.allclose(back[0].translations, frame.translations)
    assert back[0].seq_id == 48 and back[0].frame_id == 7


def test_backprojection_recovers_surface(obj_models):
    rng = np.random.default_rng(2)
    _, R, t = make_pose(rng)
    frame = ycb_real.render_frame(obj_models, [5], R[None], t[None], splat=1)
    depth_m = jnp.asarray(frame.depth.astype(np.float32)) / frame.factor_depth
    xyz = np.asarray(
        backproject(depth_m, frame.fx, frame.fy, frame.cx, frame.cy)
    )
    m = frame.depth.reshape(-1) > 0
    pts = xyz[m]
    posed = obj_models[5][:, :3] @ R.T + t
    d = np.sqrt(((pts[:, None] - posed[None]) ** 2).sum(-1).min(1))
    # pixel quantization: ~ z/fx ~ 0.8mm
    assert np.percentile(d, 95) < 3e-3


def test_eval_preprocess_extracts_segment(obj_models):
    cfg = Config()
    rng = np.random.default_rng(3)
    _, R, t = make_pose(rng)
    frame = ycb_real.render_frame(obj_models, [2, 8], np.stack([R, R]),
                                  np.stack([t, t + np.array([0.15, 0, 0],
                                                            np.float32)]))
    pre = eval_preprocess(
        jnp.asarray(frame.depth),
        jnp.asarray(frame.label),
        jnp.asarray(2),
        jnp.asarray([frame.fx, frame.fy, frame.cx, frame.cy,
                     frame.factor_depth], jnp.float32),
        jax.random.key(0),
        cfg.eval.num_point,
        cfg.eval,
    )
    assert bool(pre["ok"])
    assert pre["xyz_inlier"].shape == (256, 3)
    seg = np.asarray(pre["xyz_inlier"])
    posed = obj_models[2][:, :3] @ R.T + t
    d = np.sqrt(((seg[:, None] - posed[None]) ** 2).sum(-1).min(1))
    assert d.max() < 5e-3  # the segment lies on the class-2 surface
    # and none of class 8's points leaked in
    posed8 = obj_models[8][:, :3] @ R.T + (t + np.array([0.15, 0, 0]))
    d8 = np.sqrt(((seg[:, None] - posed8[None]) ** 2).sum(-1).min(1))
    assert d8.min() > 0.02


def test_eval_preprocess_rejects_absent_class(obj_models):
    cfg = Config()
    rng = np.random.default_rng(4)
    _, R, t = make_pose(rng)
    frame = ycb_real.render_frame(obj_models, [2], R[None], t[None])
    pre = eval_preprocess(
        jnp.asarray(frame.depth), jnp.asarray(frame.label), jnp.asarray(9),
        jnp.asarray([frame.fx, frame.fy, frame.cx, frame.cy,
                     frame.factor_depth], jnp.float32),
        jax.random.key(0), cfg.eval.num_point, cfg.eval,
    )
    assert not bool(pre["ok"])


def test_evaluate_frames_end_to_end(obj_models):
    """Random-weight model: errors are large but the pipeline is sound."""
    cfg = Config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    rng = np.random.default_rng(5)
    frames = []
    for i in range(2):
        _, R, t = make_pose(rng)
        frames.append(
            ycb_real.render_frame(obj_models, [7], R[None], t[None], frame_id=i)
        )
    res = evaluate_frames(
        frames, 7, state, model, cfg, obj_models, verbose=False
    )
    assert res.frames == 2
    assert np.isfinite(res.trans_err) and np.isfinite(res.axag_err)
    assert np.isfinite(res.add) and np.isfinite(res.add_s)
    assert res.add_s <= res.add + 1e-6  # closest-point <= matched-point


def test_evaluate_with_icp(obj_models):
    cfg = Config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    rng = np.random.default_rng(6)
    _, R, t = make_pose(rng)
    frame = ycb_real.render_frame(obj_models, [4], R[None], t[None])
    res = evaluate_frames(
        [frame], 4, state, model, cfg, obj_models, icp=True, verbose=False
    )
    assert res.frames == 1
    assert np.isfinite(res.add)


def test_batched_eval_matches_per_frame(obj_models):
    """evaluate_frames_batched must reproduce evaluate_frames' metrics."""
    from cloudaae_tpu.evaluate import evaluate_frames_batched

    cfg = Config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    rng = np.random.default_rng(12)
    frames = []
    for i in range(3):
        _, R, t = make_pose(rng)
        frames.append(
            ycb_real.render_frame(obj_models, [6], R[None], t[None], frame_id=i)
        )
    a = evaluate_frames(frames, 6, state, model, cfg, obj_models, verbose=False)
    b = evaluate_frames_batched(frames, 6, state, model, cfg, obj_models, chunk=2)
    assert a.frames == b.frames == 3
    # the FPS random starts use different keys per path; tolerances reflect
    # sampling noise, not numerics
    assert abs(a.trans_err - b.trans_err) < 0.02
    assert abs(a.add - b.add) < 0.05


def test_eval_sym_metric(obj_models):
    """With a per-class symmetry table, axag_sym_err <= axag_err and both
    are finite; with no table axag_sym_err == axag_err."""
    from cloudaae_tpu.evaluate import evaluate_frames_batched

    cfg = Config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    rng = np.random.default_rng(15)
    _, R, t = make_pose(rng)
    frames = [ycb_real.render_frame(obj_models, [0], R[None], t[None])]

    num_class = cfg.model.num_class
    flip = np.asarray(so3.exp_map(jnp.asarray([np.pi, 0.0, 0.0])))
    table = np.broadcast_to(
        np.stack([np.eye(3, dtype=np.float32), flip.astype(np.float32)]),
        (num_class, 2, 3, 3),
    ).copy()

    res = evaluate_frames_batched(
        frames, 0, state, model, cfg, obj_models, sym_rots=table
    )
    assert np.isfinite(res.axag_sym_err)
    assert res.axag_sym_err <= res.axag_err + 1e-5

    res_plain = evaluate_frames_batched(
        frames, 0, state, model, cfg, obj_models
    )
    assert res_plain.axag_sym_err == pytest.approx(res_plain.axag_err, abs=1e-6)


def test_batched_eval_with_icp(obj_models):
    """ICP refinement runs vmapped inside the batched path (one device
    program per chunk, fori_loop ICP inside it)."""
    from cloudaae_tpu.evaluate import evaluate_frames_batched

    cfg = Config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    rng = np.random.default_rng(13)
    frames = []
    for i in range(2):
        _, R, t = make_pose(rng)
        frames.append(
            ycb_real.render_frame(obj_models, [4], R[None], t[None], frame_id=i)
        )
    res = evaluate_frames_batched(
        frames, 4, state, model, cfg, obj_models, icp=True, chunk=2
    )
    assert res.frames == 2
    assert np.isfinite(res.add) and np.isfinite(res.add_s)


def test_batched_eval_streams_generator(obj_models):
    """frames may be a generator; chunks are materialized one at a time."""
    from cloudaae_tpu.evaluate import evaluate_frames_batched

    cfg = Config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    rng = np.random.default_rng(14)

    def gen():
        for i in range(3):
            _, R, t = make_pose(rng)
            yield ycb_real.render_frame(
                obj_models, [6], R[None], t[None], frame_id=i
            )

    res = evaluate_frames_batched(
        gen(), 6, state, model, cfg, obj_models, chunk=2
    )
    assert res.frames == 3
    assert np.isfinite(res.trans_err)


def test_render_is_single_sided(obj_models):
    """The renderer must not leak back-surface points through splat gaps.

    A real depth sensor sees only the front surface; without densification
    + hidden-surface culling ~55% of segment pixels backproject onto the
    hidden half of the object (the two-sided-shell bug that made rendered
    eval fixtures unusable).  Oracle: scipy ConvexHull HPR visibility.
    """
    from scipy.spatial import ConvexHull

    rng = np.random.default_rng(11)
    _, R, t = make_pose(rng)
    frame = ycb_real.render_frame(obj_models, [5], R[None], t[None])
    m = (frame.label == 6) & (frame.depth > 0)
    vs, us = np.nonzero(m)
    z = frame.depth[vs, us] / frame.factor_depth
    pts = np.stack(
        [(us - frame.cx) * z / frame.fx, (vs - frame.cy) * z / frame.fy, z], -1
    )
    posed = obj_models[5][:, :3] @ R.T + t
    norm = np.linalg.norm(posed, axis=1)
    flip = posed + 2 * (norm.max() * 10**0.8 - norm)[:, None] * posed / norm[:, None]
    hull = ConvexHull(np.vstack([flip, [[0.0, 0.0, 0.0]]]))
    vis_idx = np.array([i for i in hull.vertices if i < len(posed)])
    vis = posed[vis_idx]
    hid = posed[np.setdiff1d(np.arange(len(posed)), vis_idx)]
    mind = lambda a, b: np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1)).min(1)
    bleed = (mind(pts, hid) + 2e-3 < mind(pts, vis)).mean()
    assert bleed < 0.10, f"back-surface bleed-through {bleed:.2%}"


def test_compact_decimates_evenly():
    """compact() must decimate (not truncate) segments over capacity.

    Raster-order truncation would keep only the top image rows of a large
    segment; even decimation keeps spatial coverage.
    """
    from cloudaae_tpu.evaluate import compact

    n, capacity = 20000, 4096
    rng = np.random.default_rng(0)
    mask = np.zeros(n, bool)
    mask[rng.choice(n, 10000, replace=False)] = True
    points = np.arange(n, dtype=np.float32)[:, None] * np.ones(3, np.float32)
    out, out_mask, count = jax.jit(
        lambda p, m: compact(p, m, capacity)
    )(jnp.asarray(points), jnp.asarray(mask))
    out, out_mask, count = map(np.asarray, (out, out_mask, count))
    assert count == capacity
    kept = out[out_mask][:, 0]
    # selected rows are masked rows spread over the whole index range
    assert np.all(mask[kept.astype(int)])
    assert kept.min() < n * 0.01 and kept.max() > n * 0.98
    gaps = np.diff(np.sort(kept))
    assert gaps.max() < 4 * (10000 / capacity) * 2  # no large spatial holes

    # under capacity: order-preserving identity on the masked set
    small_mask = np.zeros(n, bool)
    small_mask[::10] = True  # 2000 < capacity
    out, out_mask, count = jax.jit(
        lambda p, m: compact(p, m, capacity)
    )(jnp.asarray(points), jnp.asarray(small_mask))
    assert int(count) == 2000
    kept = np.asarray(out)[np.asarray(out_mask)][:, 0].astype(int)
    np.testing.assert_array_equal(kept, np.nonzero(small_mask)[0])


def test_evaluate_frames_rot6d_head(obj_models):
    """Eval pipeline with the 6d rotation head: finite metrics, and the
    reported rot_pred stays axis-angle (the reference's convention)."""
    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, rot_rep="6d")
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    rng = np.random.default_rng(11)
    _, R, t = make_pose(rng)
    frame = ycb_real.render_frame(obj_models, [3], R[None], t[None])
    res = evaluate_frames(
        [frame], 3, state, model, cfg, obj_models, verbose=False
    )
    assert res.frames == 1
    assert np.isfinite(res.axag_err) and 0 <= res.axag_err <= np.pi + 1e-3
    assert np.isfinite(res.add_s)


def test_add_auc_closed_form():
    """AUC = E[max(0, 1 - d/0.1)] — exact for the 0..10cm threshold sweep
    (PoseCNN YCB protocol): spot-check against an explicit threshold
    integral."""
    from cloudaae_tpu.evaluate import _result_from_acc

    d = np.array([0.0, 0.01, 0.05, 0.09, 0.2])  # last one beyond 10cm
    acc = {
        "trans_err": list(d), "axag_err": list(d), "axag_sym_err": list(d),
        "add": list(d), "add_s": list(d), "diam": list(np.ones_like(d)),
    }
    res = _result_from_acc(acc)
    ts = np.linspace(0, 0.1, 100001)
    auc_numeric = np.trapezoid(
        [np.mean(d < t) for t in ts], ts
    ) / 0.1
    assert abs(res.add_auc - auc_numeric) < 1e-3
    assert res.add_s_auc == res.add_auc


def test_batched_eval_icp_both_pairs(obj_models):
    """icp="both" returns (off, on) over the SAME preprocessed frames:
    the off half must match a plain icp=False run exactly (shared RNG),
    and the on half must match icp=True."""
    from cloudaae_tpu.evaluate import evaluate_frames_batched

    cfg = Config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    rng = np.random.default_rng(21)
    frames = []
    for i in range(2):
        _, R, t = make_pose(rng)
        frames.append(
            ycb_real.render_frame(obj_models, [4], R[None], t[None], frame_id=i)
        )
    off, on = evaluate_frames_batched(
        frames, 4, state, model, cfg, obj_models, icp="both", chunk=2
    )
    assert off.frames == on.frames == 2
    plain = evaluate_frames_batched(
        frames, 4, state, model, cfg, obj_models, icp=False, chunk=2
    )
    icp_only = evaluate_frames_batched(
        frames, 4, state, model, cfg, obj_models, icp=True, chunk=2
    )
    assert off.trans_err == pytest.approx(plain.trans_err, abs=1e-6)
    assert off.add == pytest.approx(plain.add, abs=1e-6)
    assert on.trans_err == pytest.approx(icp_only.trans_err, abs=1e-6)
    assert on.add == pytest.approx(icp_only.add, abs=1e-6)


def test_eval_preprocess_small_segment(obj_models):
    """Small-segment regression (VERDICT r3 #3): a far/tiny object whose
    segment has only a few hundred pixels must either pass with a
    surface-accurate segment (keep-all outlier fallback under
    outlier_min_inliers, evaluate_cloudAAE_ycbv.py:256-257) or be gated
    out — never emit a garbage segment with ok=True."""
    cfg = Config()
    rng = np.random.default_rng(17)
    _, R, _ = make_pose(rng)
    # large_marker (cls 17) rendered sparse: no densification, small splat
    t = np.array([0.02, -0.01, 0.9], np.float32)
    frame = ycb_real.render_frame(
        obj_models, [17], R[None], t[None], densify=4, splat=1
    )
    n_px = int((np.asarray(frame.label) == 18).sum())
    pre = eval_preprocess(
        jnp.asarray(frame.depth), jnp.asarray(frame.label), jnp.asarray(17),
        jnp.asarray([frame.fx, frame.fy, frame.cx, frame.cy,
                     frame.factor_depth], jnp.float32),
        jax.random.key(0), cfg.eval.num_point, cfg.eval,
    )
    if bool(pre["ok"]):
        # keep-all fallback applies (segment < outlier_min_inliers) and
        # the FPS output still lies on the object surface
        assert int(pre["num_inlier"]) >= cfg.eval.min_valid_points
        seg = np.asarray(pre["xyz_inlier"])
        posed = obj_models[17][:, :3] @ R.T + t
        d = np.sqrt(((seg[:, None] - posed[None]) ** 2).sum(-1).min(1))
        assert d.max() < 8e-3, (n_px, d.max())
    else:
        # gated out only when genuinely too small
        assert n_px < 600, n_px
