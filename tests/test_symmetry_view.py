"""View-equivalent symmetry detection (symmetry.detect_view_symmetries).

Synthetic shapes with known ground truth:

  * a "can" whose top disk is recessed below the rim: the top-bottom flip
    is NOT a geometric symmetry (the recess breaks it) but IS depth-view
    ambiguous from generic viewpoints — the extension must add it;
  * the same can with a tall handle-like fin: the fin is visible from most
    views, so axial rotations must stay rejected;
  * rotation-matrix validity and closure of the emitted tables.
"""

import numpy as np
import pytest

from cloudaae_tpu import symmetry

N = 768  # model points per synthetic shape (detector-scale, test-fast)


def _cylinder_points(rng, n, radius=0.04, height=0.13, recess=0.012):
    """Closed cylinder, top disk recessed by ``recess`` below the rim."""
    n_side = int(n * 0.6)
    n_disk = (n - n_side) // 2
    theta = rng.uniform(0, 2 * np.pi, n_side)
    z = rng.uniform(-height / 2, height / 2, n_side)
    side = np.stack(
        [radius * np.cos(theta), radius * np.sin(theta), z], axis=-1
    )
    r_b = radius * np.sqrt(rng.uniform(0, 1, n_disk))
    th_b = rng.uniform(0, 2 * np.pi, n_disk)
    bottom = np.stack(
        [r_b * np.cos(th_b), r_b * np.sin(th_b),
         np.full(n_disk, -height / 2)], axis=-1
    )
    n_top = n - n_side - n_disk
    r_t = radius * np.sqrt(rng.uniform(0, 1, n_top))
    th_t = rng.uniform(0, 2 * np.pi, n_top)
    top = np.stack(
        [r_t * np.cos(th_t), r_t * np.sin(th_t),
         np.full(n_top, height / 2 - recess)], axis=-1
    )
    return np.concatenate([side, bottom, top]).astype(np.float32)


def _flip_angles(table):
    """Angles (deg) of all non-identity elements."""
    eye = np.eye(3, dtype=np.float32)
    return [
        symmetry._geodesic_deg(R, eye)
        for R in table
        if symmetry._geodesic_deg(R, eye) > 1.0
    ]


def _has_top_bottom_flip(table):
    """Any ~180-degree rotation that reverses the z axis."""
    for R in table:
        ang = symmetry._geodesic_deg(R, np.eye(3, dtype=np.float32))
        if ang > 170.0 and R[2, 2] < -0.9:
            return True
    return False


def test_view_rotations_are_rotations():
    Rv = symmetry._view_rotations(20)
    assert Rv.shape == (20, 3, 3)
    assert np.allclose(
        np.einsum("vij,vkj->vik", Rv, Rv), np.eye(3)[None], atol=1e-5
    )
    us = symmetry.fibonacci_directions(20)
    assert np.allclose(np.linalg.norm(us, axis=-1), 1.0, atol=1e-6)
    assert np.allclose(Rv[:, 2, :], us, atol=1e-5)


def test_recessed_can_flip_is_view_but_not_geometric():
    rng = np.random.default_rng(0)
    pts = _cylinder_points(rng, N)
    geo = symmetry.detect_symmetries(pts)
    # the recess (12 mm >> ~4 mm sampling spacing) breaks the geometric
    # flip; axial rotations survive
    assert not _has_top_bottom_flip(geo), "recess should break the geo flip"
    assert len(_flip_angles(geo)) >= 4  # axial C_n detected

    view = symmetry.detect_view_symmetries(pts, num_views=12)
    assert _has_top_bottom_flip(view), (
        "depth-view extension must add the top-bottom flip"
    )
    # closure: flip composed with axial rotations grows the group
    assert len(_flip_angles(view)) > len(_flip_angles(geo))
    # and the emitted table is actually CLOSED under composition (up to
    # the cap): for a can, flip x C_n = flips about every diameter — a
    # frontier-only closure once missed these, capping the metric at
    # ~90-180 deg for predictions flipped about a non-PCA diameter
    eye = np.eye(3, dtype=np.float32)
    elems = [R for R in view if symmetry._geodesic_deg(R, eye) > 1.0]
    n_free = 32 - 1 - len(elems)  # identity-padding slots left
    missing = 0
    for A in elems:
        for B in elems:
            R = A @ B
            if all(
                symmetry._geodesic_deg(R, k) > 11.25
                for k in [eye] + elems
            ):
                missing += 1
    # either closed, or the cap was hit (no free slots to close into)
    assert missing == 0 or n_free == 0, (missing, n_free)


def test_finned_can_axial_rotations_stay_rejected():
    rng = np.random.default_rng(1)
    pts = _cylinder_points(rng, N - 120, recess=0.0)
    # a tall fin (mug-handle analogue): visible from most viewpoints
    fin = np.stack(
        [
            rng.uniform(0.04, 0.075, 120),
            rng.normal(0.0, 0.002, 120),
            rng.uniform(-0.05, 0.05, 120),
        ],
        axis=-1,
    ).astype(np.float32)
    finned = np.concatenate([pts, fin])
    view = symmetry.detect_view_symmetries(finned, num_views=12)
    # no AXIAL rotation survives: the fin disambiguates almost every view.
    # (A 180-degree flip about the fin's own axis maps fin->fin and
    # top<->bottom — with recess=0 that is a true geometric symmetry and
    # legitimately stays.)
    eye = np.eye(3, dtype=np.float32)
    for R in view:
        if symmetry._geodesic_deg(R, eye) <= 1.0:
            continue
        w, v = np.linalg.eigh((R + R.T) / 2)
        axis = v[:, np.argmax(w)]
        assert abs(axis[2]) < 0.8, (
            "axial rotation wrongly accepted", R, axis
        )


def test_view_tables_are_valid_rotations():
    rng = np.random.default_rng(2)
    pts = _cylinder_points(rng, N)
    table = symmetry.detect_view_symmetries(pts, num_views=8)
    assert table.shape == (32, 3, 3)
    assert np.allclose(
        np.einsum("sij,skj->sik", table, table), np.eye(3)[None], atol=1e-4
    )
    assert np.allclose(np.linalg.det(table), 1.0, atol=1e-4)
    assert np.allclose(table[0], np.eye(3), atol=1e-6)


def test_view_masks_shape_and_coverage():
    rng = np.random.default_rng(3)
    pts = _cylinder_points(rng, 512)
    vis = symmetry.view_visibility_masks(pts, num_views=6)
    assert vis.shape == (6, 512)
    frac = vis.mean(axis=1)
    # each view sees a strict, non-trivial subset
    assert (frac > 0.15).all() and (frac < 0.95).all(), frac
