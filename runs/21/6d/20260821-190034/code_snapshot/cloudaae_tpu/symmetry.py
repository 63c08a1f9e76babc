"""Per-class geometric symmetry detection + symmetry-aware rotation error.

The reference's rotation loss is the plain geodesic angle
(losses/angular_distance_taylor.py:103-116, weighted into the total at
train_cloudAAE_ycbv.py:268).  For depth-only input this over-penalizes
geometrically symmetric objects (cans, boxes, bowls): a 180-degree box flip
produces an *identical* point cloud, yet costs pi radians of loss.  This
module adds the capability the reference lacks:

  * :func:`detect_symmetries` derives each class's rotational symmetry
    group directly from its point model — no hand-coded per-class axis
    tables.  Candidate rotations about the model's principal (PCA) axes
    are ICP-refined, then scored by the p99 self-Chamfer residual in
    sampling-spacing units; candidates below a tolerance are kept.  A
    cylinder (can) yields many rotations about its axis (approximating its
    continuous symmetry), a rectangular box yields the 180-degree flips of
    its D2 group, an asymmetric object yields only the identity.
  * :func:`rotation_error_sym` is the min-over-group geodesic error:
    ``min_S geodesic(R_pred, R_gt @ S)`` — by the posing convention
    ``cloud = model @ R^T + t`` (train_cloudAAE_ycbv.py:88-93), if
    ``model @ S^T ~= model`` as a set then ``R_gt @ S`` poses the model
    onto the same cloud as ``R_gt``.

Enable via ``LossConfig.rot_sym`` (cloudaae_tpu/config.py); the training
step then optimizes the symmetry-aware error while still reporting the
plain geodesic for parity with the reference's logs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cloudaae_tpu import so3
from cloudaae_tpu.ops.chamfer import nn_distance


def principal_axes(points: jnp.ndarray) -> jnp.ndarray:
    """PCA axes of a centered cloud: (N, 3) -> (3, 3) rows = unit axes.

    Rotational symmetry axes of a (uniformly sampled) shape are principal
    axes of its covariance, so these are the only axis candidates needed.
    """
    centered = points - jnp.mean(points, axis=0)
    cov = jnp.matmul(centered.T, centered, precision="highest")
    _, vecs = jnp.linalg.eigh(cov)
    return vecs.T  # rows


def candidate_rotations(points: jnp.ndarray, num_angles: int = 16) -> jnp.ndarray:
    """All non-identity candidate symmetry rotations for one model.

    For each of the 3 principal axes: rotations by ``k * 2*pi / num_angles``
    for k = 1..num_angles-1.  With num_angles=16 this captures C2/C4/C8/C16
    subgroups exactly and approximates continuous (cylindrical) symmetry to
    22.5-degree resolution.

    Returns (3 * (num_angles - 1), 3, 3).
    """
    axes = principal_axes(points)  # (3, 3)
    ks = jnp.arange(1, num_angles, dtype=points.dtype)
    angles = ks * (2.0 * jnp.pi / num_angles)  # (A,)
    axags = axes[:, None, :] * angles[None, :, None]  # (3, A, 3)
    return so3.exp_map(axags.reshape(-1, 3))


def sampling_spacing(points: jnp.ndarray) -> jnp.ndarray:
    """p99 of the first-neighbor distance: the cloud's sampling resolution.

    The natural unit for self-Chamfer scores: a true symmetry maps the
    sample set back onto the *surface*, so its NN residuals are bounded by
    the sampling spacing regardless of how densely the model was sampled;
    a near-symmetry displaces some region by a geometric amount that does
    not shrink with resolution.  (Diameter normalization fails this test —
    the same shape sampled sparsely scores "less symmetric".)
    """
    centered = points - jnp.mean(points, axis=0)
    d = jnp.sum((centered[:, None] - centered[None, :]) ** 2, axis=-1)
    d = d + jnp.eye(points.shape[0], dtype=points.dtype) * 1e9
    return jnp.quantile(jnp.sqrt(jnp.min(d, axis=-1)), 0.99)


def symmetry_score(points: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """Worst-case self-Chamfer score of each candidate, in spacing units.

    score(R) = p99(sqrt(nn_dist(X, X @ R^T)), both directions) / spacing,
    with X centered.  The p99 (not mean) is what separates true symmetries
    from near-symmetries: a banana's curved body nearly self-matches under
    a 180-degree flip *on average*, but its tips land far off-surface; a
    true symmetry keeps even its p99 at the sampling noise floor.  Measured
    on the 2048-point YCB models: true symmetries (cans' C_inf, box D2,
    bowl, wood_block C4, clamp C2 flips) score 0.62-1.06, near-symmetries
    (scissors 2.36, banana 3.02, mug 3.16) score above — both mean-based
    and diameter-normalized scoring had the two kinds overlapping.

    Args:
      points: (N, 3) model points (object frame).
      rotations: (S, 3, 3).
    Returns:
      (S,) scores (units of the cloud's p99 sampling spacing).
    """
    centered = points - jnp.mean(points, axis=0)
    spacing = sampling_spacing(points)

    def one(R):
        rotated = jnp.matmul(centered, R.T, precision="highest")
        d1, _, d2, _ = nn_distance(centered, rotated)
        d = jnp.quantile(
            jnp.sqrt(jnp.maximum(jnp.concatenate([d1, d2]), 0.0)), 0.99
        )
        return d / spacing

    return jax.lax.map(one, rotations)


def refine_rotations(
    points: jnp.ndarray, rotations: jnp.ndarray, iters: int = 12
) -> jnp.ndarray:
    """Rotation-only ICP refinement of candidate symmetries.

    Candidates come from a discretized grid about *estimated* (PCA) axes,
    which misses true group elements in two ways: angular discretization,
    and PCA axis error when two covariance eigenvalues are close (YCB's
    near-square foam_brick: the principal axes of its covariance are
    rotated within the degenerate plane, so no grid candidate aligns with
    its 180-degree flips).  A few NN + Kabsch iterations lock a nearby
    candidate onto the local optimum of the self-Chamfer objective; true
    symmetries converge to the exact group element, non-symmetries stay
    high-scoring and are rejected by the caller's tolerance.
    """
    centered = points - jnp.mean(points, axis=0)

    def refine_one(R0):
        def body(_, R):
            rotated = jnp.matmul(centered, R.T, precision="highest")
            _, idx, _, _ = nn_distance(rotated, centered)
            target = centered[idx]
            # Kabsch: min_R ||centered @ R^T - target||_F
            H = jnp.matmul(centered.T, target, precision="highest")
            U, _, Vt = jnp.linalg.svd(H)
            det = jnp.linalg.det(jnp.matmul(Vt.T, U.T))
            D = jnp.diag(jnp.array([1.0, 1.0, 0.0], points.dtype)) + \
                jnp.diag(jnp.array([0.0, 0.0, 1.0], points.dtype)) * det
            return jnp.matmul(Vt.T, jnp.matmul(D, U.T))

        return jax.lax.fori_loop(0, iters, body, R0)

    return jax.lax.map(refine_one, rotations)


def _geodesic_deg(Ra: np.ndarray, Rb: np.ndarray) -> float:
    tr = np.trace(Ra.T @ Rb)
    return float(np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))))


def detect_symmetries(
    points: np.ndarray,
    max_syms: int = 16,
    num_angles: int = 16,
    tol: float = 1.6,
    refine_iters: int = 12,
    gate: float = 8.0,
) -> np.ndarray:
    """Symmetry group of one model as a fixed-size rotation table.

    Pipeline: score the PCA-axis candidate grid -> ICP-refine every
    candidate under a loose gate -> rescore -> accept below ``tol`` ->
    dedupe refined rotations that converged to the same group element
    (or collapsed to the identity).

    The refinement is what makes the detector robust: non-symmetries have
    no stable non-identity optimum and ICP drives them to angle ~0 (which
    the identity-exclusion radius rejects); true symmetries of shapes with
    near-degenerate covariance (YCB foam_brick: PCA axes rotated within
    the near-square cross-section plane, grid flips score 2.9-3.6) lock
    onto the exact group element (180.0 degrees at 1.52).

    Args:
      points: (N, 3) model points.
      max_syms: table size S; slot 0 is always the identity, unused slots
        are identity-padded (duplicates never change a min-over-group).
      num_angles: per-axis angular resolution of the candidate set; also
        sets the dedupe / identity-exclusion radius 180/num_angles deg
        (rotations closer than that to a kept element are sampling-noise
        copies of it, e.g. the 172-degree shadow of a 180-degree flip).
      tol: accept candidates whose refined p99 self-Chamfer residual is
        below ``tol`` sampling-spacing units (YCB: true symmetries score
        0.6-1.52 refined, nearest true negative 2.05).
      refine_iters: NN+Kabsch iterations per gated candidate (12 lets
        non-symmetries fully collapse to the identity).
      gate: only refine candidates scoring below this (spacing units) —
        a pure compute saver; everything structurally plausible is far
        below it (worst true YCB symmetry pre-refinement: 3.55).
    Returns:
      (max_syms, 3, 3) float32 rotation table.
    """
    pts = jnp.asarray(np.asarray(points, np.float32))
    cands = candidate_rotations(pts, num_angles)
    scores = np.asarray(symmetry_score(pts, cands))

    gated = np.flatnonzero(scores < gate)
    if gated.size:
        refined = refine_rotations(pts, cands[gated], iters=refine_iters)
        rescored = np.asarray(symmetry_score(pts, refined))
        refined = np.asarray(refined, np.float32)
    else:
        refined = np.zeros((0, 3, 3), np.float32)
        rescored = np.zeros((0,), np.float32)

    min_sep = 180.0 / num_angles
    table = [np.eye(3, dtype=np.float32)]
    for i in np.argsort(rescored):
        if rescored[i] >= tol or len(table) >= max_syms:
            break
        R = refined[i]
        if any(_geodesic_deg(R, kept) <= min_sep for kept in table):
            continue
        # group closure: a true group element's square is also a group
        # element, so it must self-match too.  This rejects the partially
        # collapsed shadows that land just outside the exclusion radius
        # (a thin banana rotated 11 degrees about its long axis scores
        # under tol, but its 22-degree square scores 3.0).
        sq = float(symmetry_score(pts, jnp.asarray(R @ R)[None])[0])
        if sq < tol:
            table.append(R)
    while len(table) < max_syms:
        table.append(np.eye(3, dtype=np.float32))
    return np.stack(table)


def fibonacci_directions(n: int) -> np.ndarray:
    """n near-uniform unit directions on S^2 (Fibonacci sphere), (n, 3)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    z = 1.0 - 2.0 * i / n
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


def _view_rotations(num_views: int) -> np.ndarray:
    """One rotation per Fibonacci direction u: row 2 = u, so the posed
    cloud ``centered @ R.T + z0*ez`` presents the object's u-hemisphere to
    a camera at the origin looking along +z.  (num_views, 3, 3)."""
    us = fibonacci_directions(num_views)
    rots = []
    for u in us:
        a = np.array([1.0, 0.0, 0.0])
        if abs(np.dot(a, u)) > 0.9:
            a = np.array([0.0, 1.0, 0.0])
        x = np.cross(u, a)
        x /= np.linalg.norm(x)
        y = np.cross(u, x)
        rots.append(np.stack([x, y, u]))
    return np.stack(rots).astype(np.float32)


def view_visibility_masks(
    points: jnp.ndarray,
    num_views: int = 20,
    view_distance: float = 0.75,
    hpr_param: float = 0.8 * np.pi,
    hpr_iters: int = 12,
) -> np.ndarray:
    """What a depth camera sees of the model from each view: (V, N) bool.

    The same HPR operator the synthesis pipeline uses to produce training
    segments (ops.hpr, replacing utils/hidden_point_removal.py) — so "the
    camera cannot tell these poses apart" is judged by the exact
    self-occlusion model the rest of the framework lives by.  The object
    is placed at ``view_distance`` on the optical axis (a typical YCB/
    LINEMOD working distance; visibility is only weakly distance-
    dependent at these scales).
    """
    from cloudaae_tpu.ops.hpr import hpr_visible_mask

    centered = points - jnp.mean(points, axis=0)
    Rv = jnp.asarray(_view_rotations(num_views), points.dtype)
    offset = jnp.array([0.0, 0.0, view_distance], points.dtype)

    def one(R):
        posed = jnp.matmul(centered, R.T, precision="highest") + offset
        return hpr_visible_mask(posed, hpr_param, iters=hpr_iters)

    return np.asarray(jax.lax.map(one, Rv))


def view_ambiguity_fraction(
    points: jnp.ndarray,
    rotations: jnp.ndarray,
    vis_masks: np.ndarray,
    view_tol: float = 1.6,
    q: float = 0.99,
) -> np.ndarray:
    """Fraction of views from which each candidate is depth-ambiguous.

    A depth camera sees only the HPR-visible surface; a rotation S is
    *view-equivalent* from view k when the visible cloud and its S-image
    tell the same story: every visible point lies on the rotated surface
    (row direction) and the rotated visible set lies back on the surface
    (column direction).  Both directions come from one (N, N) distance
    matrix D[i,j] = |a_i - S a_j|^2 per candidate; per view, the masked
    p-quantiles of the row/col nearest distances are scored in sampling-
    spacing units (same unit as :func:`symmetry_score`).  The quantile can
    be as strict as the geometric scorer's p99 because targets are always
    the FULL rotated model — visibility-mask boundaries add no noise to
    the nearest-distance field — and a loose quantile forgives exactly the
    small distinctive features (a banana's tips, a marker's nib) that make
    a near-symmetry resolvable.

    This is the capability the pure geometric detector lacks (VERDICT r3):
    a can's top-vs-bottom flip is NOT a geometric symmetry (the recessed
    lid differs from the base) but from almost every viewpoint the depth
    image is identical — exactly the ambiguity the min-over-group metric
    should forgive.

    Args:
      points: (N, 3) model points.
      rotations: (S, 3, 3) candidates.
      vis_masks: (V, N) bool from :func:`view_visibility_masks`.
      view_tol: per-view acceptance threshold (spacing units).
      q: quantile of the visible-point residuals per view.
    Returns:
      (S,) fraction of views with score < view_tol.
    """
    centered = points - jnp.mean(points, axis=0)
    spacing = float(sampling_spacing(points))
    masks = np.asarray(vis_masks, bool)

    def dists(S):
        rotated = jnp.matmul(centered, jnp.asarray(S).T, precision="highest")
        d = (
            jnp.sum(centered**2, axis=-1, keepdims=True)
            - 2.0 * jnp.matmul(centered, rotated.T, precision="highest")
            + jnp.sum(rotated**2, axis=-1)[None, :]
        )
        row = jnp.sqrt(jnp.maximum(jnp.min(d, axis=1), 0.0))
        col = jnp.sqrt(jnp.maximum(jnp.min(d, axis=0), 0.0))
        return row, col

    fracs = []
    for S in np.asarray(rotations):
        row, col = (np.asarray(x) for x in dists(S))
        ok = 0
        for m in masks:
            s = max(
                float(np.quantile(row[m], q)), float(np.quantile(col[m], q))
            ) / spacing
            ok += s < view_tol
        fracs.append(ok / len(masks))
    return np.asarray(fracs)


def detect_view_symmetries(
    points: np.ndarray,
    max_syms: int = 32,
    num_angles: int = 16,
    tol: float = 1.6,
    view_tol: float = 1.6,
    view_frac: float = 0.6,
    num_views: int = 20,
    view_distance: float = 0.75,
    refine_iters: int = 12,
    gate: float = 8.0,
) -> np.ndarray:
    """Symmetry group extended with depth-view-equivalent rotations.

    Pipeline: the geometric group from :func:`detect_symmetries` first;
    then every ICP-refined grid candidate not already in the group is
    scored by :func:`view_ambiguity_fraction` and accepted when it is
    depth-ambiguous from at least ``view_frac`` of the sampled views;
    finally the union is closed under composition (a flip composed with
    each C_n element is also view-equivalent) up to ``max_syms``.

    The default ``view_frac=0.6`` keeps the extension honest: a can's
    top-bottom flip (ambiguous from every view except near-polar ones,
    frac ~0.85) gets in; a mug's axial rotations (handle visible from
    most views) stay out — the metric then forgives only ambiguities a
    depth camera genuinely cannot resolve from a typical viewpoint.

    Returns (max_syms, 3, 3) float32; slot 0 identity, identity-padded.
    """
    pts = jnp.asarray(np.asarray(points, np.float32))
    base = detect_symmetries(
        points, max_syms=max_syms, num_angles=num_angles, tol=tol,
        refine_iters=refine_iters, gate=gate,
    )
    eye = np.eye(3, dtype=np.float32)
    group = [eye] + [R for R in base if _geodesic_deg(R, eye) > 1e-3]

    # Candidates: the RAW grid first, then the ICP-refined grid, minus
    # whatever the geometric pass took.  Raw-first matters: view
    # equivalence lives on the *visual* bounding geometry, for which the
    # exact grid rotations about the PCA axes (90/180 degrees) are the
    # right parameterization — full-geometry ICP refinement drags a
    # near-square brick's 90-degree rotation to ~84 degrees (the
    # geometric local optimum), whose square then fails closure.
    cands = candidate_rotations(pts, num_angles)
    scores = np.asarray(symmetry_score(pts, cands))
    gated = np.flatnonzero(scores < gate)
    refined = (
        np.asarray(refine_rotations(pts, cands[gated], iters=refine_iters),
                   np.float32)
        if gated.size else np.zeros((0, 3, 3), np.float32)
    )
    min_sep = 180.0 / num_angles
    fresh = [
        R for R in
        list(np.asarray(cands, np.float32)) + list(refined)
        if not any(_geodesic_deg(R, g) <= min_sep for g in group)
    ]
    # dedupe the fresh set against itself (refinement collapses shadows;
    # raw candidates, listed first, win their dedupe radius)
    uniq: list[np.ndarray] = []
    for R in fresh:
        if not any(_geodesic_deg(R, u) <= min_sep for u in uniq):
            uniq.append(R)

    accepted: list[np.ndarray] = []
    vis_masks: np.ndarray | None = None
    if uniq:
        vis_masks = vis = view_visibility_masks(
            pts, num_views=num_views, view_distance=view_distance,
        )
        fracs = view_ambiguity_fraction(
            pts, np.stack(uniq), vis, view_tol=view_tol,
        )
        for R, f in zip(uniq, fracs):
            if f < view_frac:
                continue
            # group closure, as in the geometric detector: a true
            # (view-)group element's square must also be ambiguous — this
            # rejects small partial rotations of near-tubes (a banana's
            # 11-degree roll passes alone; its 22-degree square does not)
            sq = R @ R
            closed = _geodesic_deg(sq, np.eye(3)) <= min_sep or any(
                _geodesic_deg(sq, g) <= min_sep for g in group
            )
            if not closed:
                fsq = float(
                    view_ambiguity_fraction(
                        pts, sq[None], vis, view_tol=view_tol
                    )[0]
                )
                closed = fsq >= view_frac
            if closed:
                accepted.append(R)

    # Close the assembled set (geometric ∪ view-accepted) under
    # composition, to a fixpoint or the table cap.  This matters even
    # with NO view-accepted elements: the geometric detector admits
    # refined grid candidates — rotations about the PCA axes plus flips
    # about at most two diameters — which is not a group.  A can's C16 +
    # 2 flips misses the other 14 flip diameters, and a prediction
    # flipped about one of THOSE would score ~90-180 deg under
    # min-over-group despite being symmetry-equivalent.  Every element
    # here passed a symmetry test, and true symmetries compose to true
    # symmetries.
    table = list(group)
    for V in accepted:
        if len(table) < max_syms and not any(
            _geodesic_deg(V, k) <= min_sep for k in table
        ):
            table.append(V.astype(np.float32))
    # Every fresh product is re-verified by the view-ambiguity test
    # before admission: compositions of IMPERFECT elements accumulate
    # drift (two ~90-degree near-square-prism rotations about slightly
    # different axes compose to a ~14-degree axial rotation that is NOT
    # a symmetry of the prism), and an unverified fixpoint would keep it.
    # True-symmetry products always pass (a geometric symmetry maps the
    # visible subset onto the full model by definition).
    rejected: list[np.ndarray] = []

    def product_ok(R: np.ndarray) -> bool:
        nonlocal vis_masks
        if vis_masks is None:
            vis_masks = view_visibility_masks(
                pts, num_views=num_views, view_distance=view_distance,
            )
        frac = float(
            view_ambiguity_fraction(
                pts, R[None], vis_masks, view_tol=view_tol
            )[0]
        )
        return frac >= view_frac

    changed = True
    while changed and len(table) < max_syms:
        changed = False
        snapshot = list(table)
        for A in snapshot:
            for B in snapshot:
                if len(table) >= max_syms:
                    break
                R = A @ B
                if any(_geodesic_deg(R, k) <= min_sep for k in table):
                    continue
                if any(_geodesic_deg(R, k) <= min_sep for k in rejected):
                    continue
                if product_ok(R):
                    table.append(R.astype(np.float32))
                    changed = True
                else:
                    rejected.append(R.astype(np.float32))
    while len(table) < max_syms:
        table.append(eye)
    return np.stack(table[:max_syms])


def build_symmetry_table(
    obj_models: np.ndarray,
    max_syms: int = 16,
    num_angles: int = 16,
    tol: float = 1.6,
    view_sym: bool = False,
    view_tol: float = 1.6,
    view_frac: float = 0.6,
) -> np.ndarray:
    """Per-class symmetry tables: (C, N, 3+) models -> (C, S, 3, 3).

    ``view_sym=True`` uses :func:`detect_view_symmetries` (geometric group
    + depth-view-equivalent flips) instead of the purely geometric
    detector.
    """
    detect = (
        functools.partial(
            detect_view_symmetries, view_tol=view_tol, view_frac=view_frac
        )
        if view_sym else detect_symmetries
    )
    return np.stack(
        [
            detect(
                np.asarray(obj_models[c][..., :3], np.float32),
                max_syms=max_syms,
                num_angles=num_angles,
                tol=tol,
            )
            for c in range(obj_models.shape[0])
        ]
    )


def table_cache_name(
    pts: np.ndarray,
    max_syms: int = 16,
    num_angles: int = 16,
    tol: float = 1.6,
    view_sym: bool = False,
    view_tol: float = 1.6,
    view_frac: float = 0.6,
) -> str:
    """Content-hash cache filename for a (C, N, 3) model set + knobs."""
    import hashlib

    pts = np.ascontiguousarray(np.asarray(pts, np.float32)[..., :3])
    h = hashlib.sha1()
    h.update(pts.tobytes())
    h.update(f"{pts.shape}|{max_syms}|{num_angles}|{tol}".encode())
    if view_sym:
        h.update(f"|view|{view_tol}|{view_frac}".encode())
    return f"symtable-{h.hexdigest()[:16]}.npy"


def build_symmetry_table_cached(
    obj_models: np.ndarray,
    max_syms: int = 16,
    num_angles: int = 16,
    tol: float = 1.6,
    cache_dir: str | None = None,
    view_sym: bool = False,
    view_tol: float = 1.6,
    view_frac: float = 0.6,
) -> np.ndarray:
    """Disk-cached :func:`build_symmetry_table`.

    Detection is a pure function of the models and the knobs, so the table
    is memoized under a content hash — a training run pays the detection
    cost (minutes on CPU for 21 x 2048-pt models) at most once per model
    set instead of once per process.
    """
    import os

    pts = np.ascontiguousarray(
        np.asarray(obj_models, np.float32)[..., :3]
    )
    name = table_cache_name(
        pts, max_syms, num_angles, tol, view_sym, view_tol, view_frac
    )
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "cloudaae_tpu"
    )
    path = os.path.join(cache_dir, name)
    # read-only fallback: tables for the shipped model sets travel with
    # the package (detection is minutes of CPU per fresh environment)
    packaged = os.path.join(os.path.dirname(__file__), "_cache", name)
    for cand in (path, packaged):
        if os.path.exists(cand):
            table = np.load(cand)
            if table.shape == (pts.shape[0], max_syms, 3, 3):
                return table
    table = build_symmetry_table(
        pts, max_syms=max_syms, num_angles=num_angles, tol=tol,
        view_sym=view_sym, view_tol=view_tol, view_frac=view_frac,
    )
    os.makedirs(cache_dir, exist_ok=True)
    # np.save appends ".npy" unless the name already ends with it.
    tmp = f"{path}.tmp.{os.getpid()}.npy"
    np.save(tmp, table)
    os.replace(tmp, path)
    return table


def num_symmetries(table: np.ndarray) -> np.ndarray:
    """Count non-identity entries per class in a (C, S, 3, 3) table."""
    eye = np.eye(3, dtype=table.dtype)
    non_id = np.abs(table - eye).max(axis=(-1, -2)) > 1e-5
    return non_id.sum(axis=-1) + 1  # + identity


def rotation_error_sym(
    pred_axag: jnp.ndarray,
    label_axag: jnp.ndarray,
    sym_rots: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Min-over-symmetry-group geodesic rotation error.

    Args:
      pred_axag: (B, 3) predicted axis-angle.
      label_axag: (B, 3) ground-truth axis-angle.
      sym_rots: (B, S, 3, 3) symmetry rotations of each sample's class
        (gather a (C, S, 3, 3) table by class_id).
    Returns:
      (mean_angle, per_sample_angle (B,)) in radians; reduces to
      :func:`so3.rotation_error` when sym_rots is all-identity.
    """
    return rotation_error_sym_mat(so3.exp_map(pred_axag), label_axag, sym_rots)


def rotation_error_multihyp(
    R_hyps: jnp.ndarray,
    label_axag: jnp.ndarray,
    sym_rots: jnp.ndarray | None = None,
    relax: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Relaxed winner-take-all min-over-hypotheses geodesic rotation loss.

    The multi-hypothesis generalization of :func:`rotation_error_sym_mat`
    for a k-hypothesis rotation head (ModelConfig.num_rot_hyp): per sample
    each hypothesis scores its min-over-symmetry-group geodesic to the
    label, the winner is the lowest-scoring hypothesis, and the loss is
    ``(1 - relax) * winner + relax * mean-over-hypotheses`` — the epsilon
    share keeps losing hypotheses trainable (relaxed WTA, Rupprecht et al.
    ICCV 2017) while the min lets hypotheses specialize to the discrete
    modes of view-dependent pose ambiguities that per-class global
    symmetry groups cannot express (docs/VIEW_SYMMETRY.md).

    Args:
      R_hyps: (B, k, 3, 3) hypothesis rotation matrices.
      label_axag: (B, 3) ground-truth axis-angle.
      sym_rots: optional (B, S, 3, 3) symmetry rotations per sample.
      relax: epsilon share of the mean-over-hypotheses term.
    Returns:
      (loss_mean, per_sample_min (B,), winner (B,) int32).  With collapsed
      (identical) hypotheses the loss equals the k = 1 loss for any relax;
      with relax = 0 it is the plain WTA min.
    """
    R_gt = so3.exp_map(label_axag)  # (B, 3, 3)
    if sym_rots is None:
        theta = so3.geodesic_angle(R_hyps, R_gt[:, None])  # (B, k)
    else:
        R_equiv = jnp.einsum(
            "bij,bsjk->bsik", R_gt, sym_rots, precision="highest"
        )  # (B, S, 3, 3)
        theta = so3.geodesic_angle(
            R_hyps[:, :, None], R_equiv[:, None]
        )  # (B, k, S)
        theta = jnp.min(theta, axis=-1)  # (B, k)
    per_min = jnp.min(theta, axis=-1)
    winner = jnp.argmin(theta, axis=-1).astype(jnp.int32)
    per_loss = per_min
    if relax:
        per_loss = (1.0 - relax) * per_min + relax * jnp.mean(theta, axis=-1)
    return jnp.mean(per_loss), per_min, winner


def rotation_error_sym_mat(
    R_pred: jnp.ndarray,
    label_axag: jnp.ndarray,
    sym_rots: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`rotation_error_sym` with the prediction already a matrix
    (shared by both rotation-head representations, so3.head_to_mat)."""
    R_gt = so3.exp_map(label_axag)  # (B, 3, 3)
    R_equiv = jnp.einsum(
        "bij,bsjk->bsik", R_gt, sym_rots, precision="highest"
    )  # (B, S, 3, 3)
    theta = so3.geodesic_angle(R_pred[:, None], R_equiv)  # (B, S)
    per_sample = jnp.min(theta, axis=-1)
    return jnp.mean(per_sample), per_sample
