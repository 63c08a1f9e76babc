"""Radius outlier removal on device.

Replaces the ``open3d.remove_radius_outlier`` host py_func in the eval
pipeline (evaluate_cloudAAE_ycbv.py:250-258): a point is an inlier iff at
least ``nb_points`` other points lie within ``radius``.  On TPU this is the
same pairwise-distance matmul as kNN plus a thresholded count.
"""

from __future__ import annotations

import jax.numpy as jnp

from cloudaae_tpu.ops.knn import pairwise_sq_dist


def radius_outlier_mask(
    points: jnp.ndarray,
    nb_points: int,
    radius: float,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Inlier mask: >= nb_points neighbors within radius (excluding self).

    open3d's ``remove_radius_outlier(nb_points, radius)`` keeps points with
    at least nb_points neighbors inside the sphere; the reference falls back
    to keeping everything when fewer than 512 inliers survive
    (evaluate_cloudAAE_ycbv.py:256-257) — that policy lives in the caller.

    Args:
      points: (..., N, 3).
      mask: optional (..., N) bool validity mask for padded clouds.
    Returns:
      (..., N) bool inlier mask (False wherever ``mask`` is False).
    """
    d = pairwise_sq_dist(points)
    within = d <= radius * radius
    if mask is not None:
        within = within & mask[..., None, :]
    # exclude self-count
    counts = jnp.sum(within, axis=-1) - 1
    inlier = counts >= nb_points
    if mask is not None:
        inlier = inlier & mask
    return inlier
