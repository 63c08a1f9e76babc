"""Pairwise distances, kNN, and DGCNN edge features.

TPU-native equivalents of ``utils/tf_util.py:597-706``
(``pairwise_xyz_distance``, ``knn``, ``get_edge_feature``,
``get_edge_feature_wo_center``).  The pairwise matrix is the classic
``|x|^2 - 2 x y^T + |y|^2`` formulation — one (N,3)x(3,N) matmul the MXU eats
directly; top-k rides XLA's sort.  No flat-gather index arithmetic is needed
(the reference flattens batch x points to use tf.gather,
utils/tf_util.py:658-662); ``take_along_axis`` keeps it batched and fusable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def pairwise_sq_dist(points: jnp.ndarray, coord_dims: int = 3) -> jnp.ndarray:
    """Squared pairwise distances of the first ``coord_dims`` channels.

    The reference computes neighborhoods from the first 3 channels of the
    *current feature map* at every DGCNN block (utils/tf_util.py:608), so
    later blocks do kNN in a learned 3-D space — we reproduce that contract.

    Args:
      points: (..., N, C) with C >= coord_dims.
    Returns:
      (..., N, N) squared distances.
    """
    xyz = points[..., :coord_dims]
    sq = jnp.sum(jnp.square(xyz), axis=-1, keepdims=True)         # (..., N, 1)
    inner = jnp.matmul(xyz, jnp.swapaxes(xyz, -1, -2), precision=lax.Precision.HIGHEST)
    return sq - 2.0 * inner + jnp.swapaxes(sq, -1, -2)


def knn_indices(
    sq_dist: jnp.ndarray,
    k: int,
    approx_recall: float | None = None,
) -> jnp.ndarray:
    """Indices of the k nearest neighbors from a pairwise distance matrix.

    Mirrors ``tf_util.knn`` (utils/tf_util.py:621-632): top-k of the negated
    distances, so a point's own index is (normally) its first neighbor.

    Args:
      sq_dist: (..., N, N).
      approx_recall: if set, use ``lax.approx_max_k`` (TPU PartialReduce) at
        this recall target instead of the exact full sort — a quality/speed
        knob (config.ModelConfig.knn_approx_recall); neighbor sets may then
        differ in ~(1-recall) of entries.
    Returns:
      (..., N, k) int32.
    """
    if approx_recall is not None:
        _, idx = lax.approx_max_k(-sq_dist, k, recall_target=approx_recall)
    else:
        _, idx = lax.top_k(-sq_dist, k)
    return idx.astype(jnp.int32)


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather: (..., N, C), (..., M) int -> (..., M, C).

    Expressed as per-batch ``take(axis=0)`` so XLA lowers it to row-slice
    gathers.  (A broadcasted ``take_along_axis`` looks like an independent
    per-*element* gather and runs ~12x slower on TPU.)
    """
    fn = lambda xb, ib: jnp.take(xb, ib, axis=0)
    for _ in range(x.ndim - 2):
        fn = jax.vmap(fn)
    return fn(x, idx)


def gather_neighbors(features: jnp.ndarray, nn_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features: (..., N, C), (..., N, k) -> (..., N, k, C)."""
    *batch, n, k = nn_idx.shape
    c = features.shape[-1]
    gathered = gather_rows(features, nn_idx.reshape(*batch, n * k))
    return gathered.reshape(*batch, n, k, c)


def edge_feature(
    features: jnp.ndarray, nn_idx: jnp.ndarray, include_center: bool = True
) -> jnp.ndarray:
    """DGCNN edge features: concat(center, neighbor - center).

    Mirrors ``tf_util.get_edge_feature`` (utils/tf_util.py:635-669) and the
    ``_wo_center`` variant (:672-706, ``include_center=False``).

    Args:
      features: (..., N, C).
      nn_idx: (..., N, k).
    Returns:
      (..., N, k, 2C) — or (..., N, k, C) without the center.
    """
    neighbors = gather_neighbors(features, nn_idx)
    center = jnp.broadcast_to(features[..., None, :], neighbors.shape)
    if include_center:
        return jnp.concatenate([center, neighbors - center], axis=-1)
    return neighbors - center
