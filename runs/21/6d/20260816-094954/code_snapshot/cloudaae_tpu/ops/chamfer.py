"""Bidirectional nearest-neighbor distance (Chamfer) with a custom VJP.

TPU-native replacement for the reference's ``NnDistance``/``NnDistanceGrad``
custom op (tf_ops/nn_distance/tf_nndistance.cpp:3-9, CUDA kernels
tf_nndistance_g.cu:5-151) and ``losses/chamfer_loss.py:8-14``.

Design:
  * Forward: the O(N*M) pairwise squared-distance matrix is one
    (N,3)x(3,M) matmul plus row/col norms — exactly MXU-shaped.  For large
    N*M the matrix is never fully materialized: rows are processed in
    chunks under ``lax.map`` so the live footprint is (chunk, M).
  * Backward: a custom VJP replays the CUDA gradient semantics
    (tf_nndistance_g.cu:132-151): d/dx1 of dist1 flows directly through the
    argmin pairing; the cross terms (dist1's dependence on x2 and dist2's on
    x1) become scatter-adds — here deterministic ``.at[].add`` scatters
    instead of CUDA ``atomicAdd`` (SURVEY.md §5.2).

Distances are *squared* Euclidean, matching the CUDA kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Row-chunk size for the tiled forward; 256 rows x M cols stays well under
# VMEM-friendly fusion sizes for M up to ~16k.
_CHUNK = 256


def _min_argmin_chunked(x: jnp.ndarray, y: jnp.ndarray, chunk: int):
    """Per-row min and argmin of squared distances, x:(N,3) y:(M,3)."""
    n = x.shape[0]
    y_sq = jnp.sum(jnp.square(y), axis=-1)                    # (M,)
    yt = y.T                                                  # (3, M)

    def one_chunk(xc):
        # (chunk, M) distances; the -2*x@yT matmul dominates and hits the MXU.
        d = (
            jnp.sum(jnp.square(xc), axis=-1, keepdims=True)
            - 2.0 * jnp.matmul(xc, yt, precision=lax.Precision.HIGHEST)
            + y_sq[None, :]
        )
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)

    if n <= chunk:
        return one_chunk(x)
    assert n % chunk == 0, f"N={n} must be a multiple of chunk={chunk}"
    dist, idx = lax.map(one_chunk, x.reshape(n // chunk, chunk, 3))
    return dist.reshape(n), idx.reshape(n)


def _nn_distance_fwd_impl(x1: jnp.ndarray, x2: jnp.ndarray, chunk: int):
    d1, i1 = _min_argmin_chunked(x1, x2, chunk)
    d2, i2 = _min_argmin_chunked(x2, x1, chunk)
    return d1, i1, d2, i2


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _nn_distance(x1: jnp.ndarray, x2: jnp.ndarray):
    return _nn_distance_fwd_impl(x1, x2, _CHUNK)


def _nn_distance_fwd(x1, x2):
    out = _nn_distance_fwd_impl(x1, x2, _CHUNK)
    _, i1, _, i2 = out
    return out, (x1, x2, i1, i2)


def _nn_distance_bwd(res, g):
    x1, x2, i1, i2 = res
    g1, _, g2, _ = g  # cotangents of the integer argmin outputs are ignored
    # dist1_i = |x1_i - x2_{i1_i}|^2  -> dx1_i += 2 g1_i (x1_i - x2_{i1_i})
    #                                    dx2_{i1_i} -= 2 g1_i (x1_i - x2_{i1_i})
    diff1 = 2.0 * g1[:, None] * (x1 - x2[i1])
    diff2 = 2.0 * g2[:, None] * (x2 - x1[i2])
    dx1 = diff1 - jnp.zeros_like(x1).at[i2].add(diff2, mode="drop")
    dx2 = diff2 - jnp.zeros_like(x2).at[i1].add(diff1, mode="drop")
    return dx1, dx2


_nn_distance.defvjp(_nn_distance_fwd, _nn_distance_bwd)


def nn_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """Bidirectional NN squared distances, batched.

    Mirrors the Python wrapper contract ``nn_distance(xyz1, xyz2) ->
    (dist1, idx1, dist2, idx2)`` (tf_ops/nn_distance/tf_nndistance.py:14-24).

    Args:
      xyz1: (B, N, 3) or (N, 3).
      xyz2: (B, M, 3) or (M, 3).
    Returns:
      dist1 (B, N): squared distance from each xyz1 point to its nearest
        xyz2 point; idx1 (B, N) int32 index of that point; dist2/idx2
        the reverse direction.
    """
    if xyz1.ndim == 2:
        return _nn_distance(xyz1, xyz2)
    fn = _nn_distance
    for _ in range(xyz1.ndim - 2):
        fn = jax.vmap(fn)
    return fn(xyz1, xyz2)


def chamfer_loss(pred: jnp.ndarray, target: jnp.ndarray):
    """Symmetric Chamfer loss; mirrors ``losses/chamfer_loss.py:8-14``.

    ``loss_per_point = dist_fwd + dist_bwd`` (requires N == M, as in the
    reference where recon and clean target are both 1024 points), and the
    scalar loss is the mean over all entries.

    Returns:
      (scalar mean loss, per-entry (B, N) loss matrix) — the reference calls
      the per-entry rows "per sample" (SURVEY.md §2 chamfer note).
    """
    d1, _, d2, _ = nn_distance(pred, target)
    per_point = d1 + d2
    return jnp.mean(per_point), per_point
