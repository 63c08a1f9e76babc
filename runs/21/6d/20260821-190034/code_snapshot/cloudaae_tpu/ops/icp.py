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
