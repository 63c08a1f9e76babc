"""Fixed-iteration point-to-point ICP on device.

Replaces the ``open3d.registration.registration_icp`` refinement loop in the
reference eval (evaluate_cloudAAE_ycbv.py:606-642): 10 outer stages with a
correspondence radius shrinking as ``0.01 * 0.9**i``, point-to-point
estimation.  Here each stage is a fixed number of Kabsch/SVD updates with
radius-gated nearest-neighbor correspondences, all inside ``lax.fori_loop``
so the whole refinement jits into the eval step.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

_mm = functools.partial(jnp.matmul, precision="highest")


def _nearest_targets(src: jnp.ndarray, tgt: jnp.ndarray):
    """For each src point: (nearest tgt point, squared distance)."""
    d = (
        jnp.sum(jnp.square(src), axis=-1, keepdims=True)
        - 2.0 * jnp.matmul(src, tgt.T, precision=lax.Precision.HIGHEST)
        + jnp.sum(jnp.square(tgt), axis=-1)[None, :]
    )
    idx = jnp.argmin(d, axis=-1)
    return tgt[idx], jnp.min(d, axis=-1)


def _kabsch(src: jnp.ndarray, tgt: jnp.ndarray, w: jnp.ndarray):
    """Weighted rigid alignment src -> tgt: returns (R, t)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_t = jnp.sum(tgt * w[:, None], axis=0) / wsum
    sc = src - mu_s
    tc = tgt - mu_t
    h = jnp.matmul((sc * w[:, None]).T, tc, precision=lax.Precision.HIGHEST)
    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(_mm(vt.T, u.T))
    d = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(det)
    r = _mm(_mm(vt.T, d), u.T)
    t = mu_t - _mm(r, mu_s)
    return r, t


def alignment_residual(
    model: jnp.ndarray,
    segment: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    segment_mask: jnp.ndarray | None = None,
    keep_frac: float = 0.4,
) -> jnp.ndarray:
    """Trimmed model->segment alignment residual of a pose (scalar, m^2).

    Mean of the smallest ``keep_frac`` squared nearest-neighbor distances
    from the posed model points to the observed segment.  The trim makes
    the statistic occlusion-robust: a single depth view sees roughly half
    the model surface, so the hidden half's large distances carry no
    alignment signal and are dropped.  Used as the per-sample ICP
    acceptance gate (EvalConfig.icp_accept_gate): comparing the residual
    at the network pose vs the refined pose decides which to keep.
    """
    if segment_mask is not None:
        far = jnp.max(jnp.linalg.norm(segment, axis=-1)) + 1e3
        segment = jnp.where(segment_mask[:, None], segment, far)
    moved = jnp.matmul(model, R.T, precision=lax.Precision.HIGHEST) + t
    _, sq = _nearest_targets(moved, segment)
    k = max(int(model.shape[0] * keep_frac), 1)
    return jnp.mean(jnp.sort(sq)[:k])


def hypothesis_residual(
    model: jnp.ndarray,
    segment: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    segment_mask: jnp.ndarray | None = None,
    keep_frac: float = 0.9,
) -> jnp.ndarray:
    """Trimmed SEGMENT->model residual of a pose (scalar, m^2).

    The complementary direction to :func:`alignment_residual`: every
    OBSERVED depth point must lie on the hypothesized surface, so a pose
    that hides a distinctive part (a marker's clip, a mug handle) that is
    actually in view pays for every observed point of that part, with no
    hidden-half trim — ``keep_frac`` only sheds sensor-noise/boundary
    outliers (default 0.9 of the VALID segment points).  Measured as a
    rotation-hypothesis selector on the round-5 flagship
    (runs/analyze_hyps_r5c.json; docs/MULTIHYP.md): ~equal to the
    model->segment direction overall (mean 39.0 vs 37.9 deg over the five
    ambiguity classes — better on pitcher, worse on marker/brick, whose
    wrong modes are view-equivalent from most single views and thus
    undecidable from depth alone), so the eval selector stays
    :func:`alignment_residual`; this direction ships as the documented
    alternative for segments with reliable full coverage.

    Jit-friendly with a padded ``segment`` + ``segment_mask``: invalid
    rows sort to the tail as +inf and the trimmed mean is a dynamic-index
    gather into the cumulative sum.
    """
    moved = _mm(model, R.T) + t
    d = (
        jnp.sum(jnp.square(segment), axis=-1, keepdims=True)
        - 2.0 * jnp.matmul(segment, moved.T, precision=lax.Precision.HIGHEST)
        + jnp.sum(jnp.square(moved), axis=-1)[None, :]
    )
    sq = jnp.maximum(jnp.min(d, axis=-1), 0.0)                   # (S,)
    if segment_mask is None:  # static trim count
        k = max(int(keep_frac * segment.shape[0]), 1)
        return jnp.mean(jnp.sort(sq)[:k])
    sq = jnp.where(segment_mask, sq, jnp.inf)
    nv = jnp.sum(segment_mask.astype(jnp.int32))
    s_sorted = jnp.sort(sq)
    cs = jnp.cumsum(jnp.where(jnp.isfinite(s_sorted), s_sorted, 0.0))
    k = jnp.clip((keep_frac * nv).astype(jnp.int32), 1, segment.shape[0])
    return jnp.take(cs, k - 1) / k.astype(cs.dtype)


def icp_point_to_point(
    model: jnp.ndarray,
    segment: jnp.ndarray,
    R_init: jnp.ndarray,
    t_init: jnp.ndarray,
    stages: int = 10,
    iters_per_stage: int = 5,
    initial_radius: float = 0.01,
    radius_decay: float = 0.9,
    segment_mask: jnp.ndarray | None = None,
):
    """Refine a pose by ICP: align ``model`` under (R, t) to ``segment``.

    Args:
      model: (N, 3) object-model points.
      segment: (M, 3) observed points (padded entries allowed via mask).
      R_init, t_init: initial pose estimate (3, 3), (3,).
      segment_mask: optional (M,) validity; invalid points are pushed far
        away so they never win a correspondence.
    Returns:
      (R, t) refined pose.
    """
    if segment_mask is not None:
        far = jnp.max(jnp.linalg.norm(segment, axis=-1)) + 1e3
        segment = jnp.where(segment_mask[:, None], segment, far)

    def stage_body(i, state):
        R, t = state
        radius = initial_radius * radius_decay ** i.astype(jnp.float32)

        def icp_body(_, st):
            R_c, t_c = st
            moved = jnp.matmul(model, R_c.T, precision=lax.Precision.HIGHEST) + t_c
            corr, sq = _nearest_targets(moved, segment)
            w = (sq <= radius * radius).astype(moved.dtype)
            R_d, t_d = _kabsch(moved, corr, w)
            # guard: if no correspondences, keep the pose
            ok = jnp.sum(w) > 3
            R_d = jnp.where(ok, R_d, jnp.eye(3, dtype=R_d.dtype))
            t_d = jnp.where(ok, t_d, jnp.zeros_like(t_d))
            return _mm(R_d, R_c), _mm(R_d, t_c) + t_d

        return lax.fori_loop(0, iters_per_stage, icp_body, (R, t))

    return lax.fori_loop(0, stages, stage_body, (R_init, t_init))
