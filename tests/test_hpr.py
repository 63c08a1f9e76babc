"""HPR tests: the support-test visibility vs the scipy ConvexHull oracle.

The oracle reproduces the reference's exact host computation
(utils/hidden_point_removal.py:27-43): spherical flip, append the origin,
ConvexHull, visible = hull vertices minus the origin.
"""

import math

import numpy as np
import pytest
from scipy.spatial import ConvexHull

import jax
import jax.numpy as jnp

from cloudaae_tpu.ops import hpr

PARAM = 0.8 * math.pi  # train_cloudAAE_ycbv.py:105


def oracle_visible(points):
    """Reference convexHull py_func semantics -> bool mask over points."""
    norms = np.linalg.norm(points, axis=-1)
    R = norms.max() * 10.0 ** PARAM
    flipped = points * ((2 * R - norms) / norms)[:, None]
    cloud = np.concatenate([flipped, np.zeros((1, 3))], axis=0)
    hull = ConvexHull(cloud)
    mask = np.zeros(len(points), bool)
    verts = hull.vertices[hull.vertices < len(points)]
    mask[verts] = True
    return mask


def make_scene(rng, n_model=512, with_occluder=True):
    """An object-like ball of points at ~0.7m plus occluder blobs in front."""
    pts = rng.normal(size=(n_model, 3)) * 0.04
    pts[:, 2] += 0.7
    if with_occluder:
        for cx in (-0.02, 0.03):
            blob = rng.normal(size=(64, 3)) * 0.01
            blob[:, 0] += cx
            blob[:, 2] += 0.45
            pts = np.concatenate([pts, blob])
    return pts.astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_spherical_flip_matches_reference_formula(rng):
    pts = make_scene(rng, 128, with_occluder=False)
    flipped, s, dirs, norms = hpr.spherical_flip(jnp.asarray(pts), PARAM)
    R = np.linalg.norm(pts, axis=-1).max() * 10.0 ** PARAM
    want = pts + 2 * (R - np.linalg.norm(pts, axis=-1))[:, None] * pts / np.linalg.norm(pts, axis=-1)[:, None]
    # relative tolerance: values are ~2R ~ 500
    assert np.max(np.abs(np.asarray(flipped) - want)) / R < 1e-5
    assert np.allclose(np.asarray(s), 2 * R - np.linalg.norm(pts, axis=-1), rtol=1e-6)


def test_visibility_agrees_with_hull_oracle(rng):
    pts = make_scene(rng, 512 - 128)  # 384 + 128 occluder = 512 points
    got = np.asarray(hpr.hpr_visible_mask(jnp.asarray(pts), PARAM))
    want = oracle_visible(pts.astype(np.float64))
    iou = (got & want).sum() / max((got | want).sum(), 1)
    # the support test is a slightly conservative approximation of the hull
    assert iou > 0.9, f"visibility IoU {iou:.3f}"
    # it must never mark an oracle-invisible point visible in large numbers
    false_pos = (got & ~want).sum() / max(got.sum(), 1)
    assert false_pos < 0.05, f"false positive rate {false_pos:.3f}"


def test_occluder_shadows_points(rng):
    """Points directly behind a dense occluder must become invisible."""
    rng2 = np.random.default_rng(3)
    # object: plane-ish patch at z=0.8
    obj = rng2.normal(size=(256, 3)).astype(np.float32) * 0.03
    obj[:, 2] = 0.8 + rng2.normal(size=256).astype(np.float32) * 0.002
    # dense occluder slab right in front of the center of the patch
    occ = rng2.normal(size=(256, 3)).astype(np.float32) * 0.012
    occ[:, 2] = 0.5
    pts = np.concatenate([obj, occ])
    vis = np.asarray(hpr.hpr_visible_mask(jnp.asarray(pts), PARAM))
    # object points within the occluder's angular footprint:
    angular_r = 0.024 / 0.5  # occluder radius over distance
    u_obj = obj[:, :2] / obj[:, 2:3]
    behind = np.linalg.norm(u_obj, axis=-1) < angular_r * 0.5
    assert behind.sum() > 10  # scene sanity
    shadow_vis_rate = vis[:256][behind].mean()
    open_vis_rate = vis[:256][~behind].mean()
    assert shadow_vis_rate < 0.3 * open_vis_rate + 0.05


def test_self_occlusion_back_points_removed(rng):
    """A dense sphere viewed from origin: far hemisphere mostly invisible."""
    n = 1024
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = (dirs * 0.05).astype(np.float32)
    pts[:, 2] += 0.7
    vis = np.asarray(hpr.hpr_visible_mask(jnp.asarray(pts), PARAM))
    near = dirs[:, 2] < -0.3  # front hemisphere (facing camera)
    far = dirs[:, 2] > 0.3
    assert vis[near].mean() > 0.7
    assert vis[far].mean() < 0.25


def test_select_visible_semantics(rng):
    pts = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    visible = jnp.asarray(
        np.array([i % 3 == 0 for i in range(64)])
    )
    out, num_vis = hpr.select_visible(visible, pts, 32, jax.random.key(0))
    vis_idx = [i for i in range(64) if i % 3 == 0]
    assert int(num_vis) == len(vis_idx)
    # first num_vis outputs are the visible points in ascending index order
    want = np.asarray(pts)[vis_idx]
    assert np.allclose(np.asarray(out)[: len(vis_idx)], want)
    # the padding rows must be copies of visible points
    pad = np.asarray(out)[len(vis_idx):]
    for row in pad:
        assert min(np.abs(row - want).sum(axis=-1)) < 1e-6


def test_hidden_point_removal_end_to_end(rng):
    pts = make_scene(rng, 384)
    sel, num_vis, vis = hpr.hidden_point_removal(
        jnp.asarray(pts), 256, jax.random.key(1), PARAM
    )
    assert sel.shape == (256, 3)
    assert int(num_vis) == int(np.asarray(vis).sum())
    assert int(num_vis) > 50


def test_hpr_with_padding_mask(rng):
    pts = make_scene(rng, 384)  # 512 points
    padded = np.concatenate([pts, np.zeros((128, 3), np.float32)])
    mask = np.concatenate([np.ones(512, bool), np.zeros(128, bool)])
    vis_pad = np.asarray(
        hpr.hpr_visible_mask(jnp.asarray(padded), PARAM, jnp.asarray(mask))
    )
    vis_ref = np.asarray(hpr.hpr_visible_mask(jnp.asarray(pts), PARAM))
    assert not vis_pad[512:].any()
    assert (vis_pad[:512] == vis_ref).mean() > 0.999


def test_pallas_kernel_matches_jnp_path(rng):
    """The fused Pallas kernel (interpret mode on CPU) must agree with the
    chunked-jnp reference path bit-for-bit on the visibility decision."""
    import jax

    from cloudaae_tpu.ops.hpr_pallas import hpr_best_margin_pallas

    pts = make_scene(rng, 384)  # 512 points
    vis_jnp = np.asarray(
        hpr.hpr_visible_mask(jnp.asarray(pts), PARAM, use_pallas=False)
    )
    _, s, dirs, norms = hpr.spherical_flip(jnp.asarray(pts), PARAM)
    two_r = float(jnp.max(norms)) * 2.0 * 10.0 ** PARAM
    f = (s / two_r)[:, None] * dirs
    best = hpr_best_margin_pallas(
        f[None], dirs[None], iters=12, chunk=256, interpret=True
    )[0]
    vis_pal = np.asarray(best >= -2e-4 / two_r)
    assert (vis_jnp == vis_pal).all()


def test_num_test_rows_exact_on_tested_rows(rng):
    """Row restriction is exact: the first K rows get the same visibility
    as in the full computation; the rest are reported not-visible."""
    pts = make_scene(rng, 512)  # 512 model + 128 occluder = 640 points
    full = np.asarray(
        hpr.hpr_visible_mask(jnp.asarray(pts), PARAM, use_pallas=False)
    )
    part = np.asarray(
        hpr.hpr_visible_mask(
            jnp.asarray(pts), PARAM, use_pallas=False, num_test_rows=512
        )
    )
    assert (part[:512] == full[:512]).all()
    assert not part[512:].any()


def test_num_test_rows_pallas_matches_jnp(rng):
    pts = make_scene(rng, 512)
    a = np.asarray(
        hpr.hpr_visible_mask(
            jnp.asarray(pts), PARAM, use_pallas=False, num_test_rows=512
        )
    )
    # interpret-mode pallas path via the public entry
    import cloudaae_tpu.ops.hpr_pallas as hp

    orig = hp.hpr_best_margin_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    hp.hpr_best_margin_pallas = interp
    try:
        b = np.asarray(
            hpr.hpr_visible_mask(
                jnp.asarray(pts), PARAM, use_pallas=True, num_test_rows=512
            )
        )
    finally:
        hp.hpr_best_margin_pallas = orig
    assert (a == b).all()


def test_hidden_point_removal_rows_only_selection_matches_full(rng):
    """With >=num_out visible model rows, the selected segment is identical
    whether or not occluder rows were tested (ascending-index order puts
    model rows first either way) — the exactness condition of
    config.SynthConfig.hpr_model_rows_only."""
    pts = make_scene(rng, 512)
    key = jax.random.key(3)
    sel_full, nv_full, vis_full = hpr.hidden_point_removal(
        jnp.asarray(pts), 128, key, PARAM
    )
    sel_part, nv_part, _ = hpr.hidden_point_removal(
        jnp.asarray(pts), 128, key, PARAM, num_test_rows=512
    )
    assert int(np.asarray(vis_full)[:512].sum()) >= 128  # condition holds
    assert np.array_equal(np.asarray(sel_full), np.asarray(sel_part))
    assert int(nv_part) == int(np.asarray(vis_full)[:512].sum())


def test_num_test_rows_non_chunk_multiple_contract(rng):
    """Rows at and past a non-chunk-multiple num_test_rows are never
    visible, even inside the rounded-up compute chunk."""
    pts = make_scene(rng, 512)
    full = np.asarray(
        hpr.hpr_visible_mask(jnp.asarray(pts), PARAM, use_pallas=False)
    )
    p500 = np.asarray(
        hpr.hpr_visible_mask(
            jnp.asarray(pts), PARAM, use_pallas=False, num_test_rows=500
        )
    )
    assert (p500[:500] == full[:500]).all()
    assert not p500[500:].any()
