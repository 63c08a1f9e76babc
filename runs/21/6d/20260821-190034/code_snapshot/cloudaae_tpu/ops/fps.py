"""Farthest point sampling on TPU.

Replaces the reference's CUDA-only ``FarthestPointSample`` op
(tf_ops/sampling/tf_sampling_g.cu:105-170: iterative argmax of the running
min-distance with a shared-memory reduction) and the numpy host FPS used in
the eval pipeline (evaluate_cloudAAE_ycbv.py:230-247).

The algorithm is inherently sequential in the number of samples K, so it is a
``lax.fori_loop`` over K; each iteration is a fully vectorized
distance-update + argmax over all N points (and over the whole batch via
vmap), which maps onto the VPU.  K is small in every reference use (256-1024)
so the loop is cheap relative to the model.  Like the CUDA op, it has no
gradient (tf_ops/sampling/tf_sampling.py:57 registers NoGradient).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _fps_single(
    points: jnp.ndarray,
    npoint: int,
    start_idx: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """FPS over one cloud: (N, C>=3) -> (npoint,) int32 indices.

    With a validity ``mask``, invalid points are never selected (their
    running distance is pinned to -inf); if fewer valid points exist than
    ``npoint``, selections repeat among valid points.
    """
    xyz = points[..., :3]
    n = xyz.shape[0]
    floor = None if mask is None else jnp.where(mask, jnp.inf, -jnp.inf)

    def body(i, state):
        dists, idx = state
        last = xyz[idx[i - 1]]
        d = jnp.sum(jnp.square(xyz - last), axis=-1)
        dists = jnp.minimum(dists, d)
        if floor is not None:
            dists = jnp.minimum(dists, floor)
        idx = idx.at[i].set(jnp.argmax(dists).astype(jnp.int32))
        return dists, idx

    init_idx = jnp.zeros((npoint,), jnp.int32).at[0].set(start_idx)
    init_dists = jnp.full((n,), jnp.inf, xyz.dtype)
    if floor is not None:
        init_dists = floor
    _, idx = lax.fori_loop(1, npoint, body, (init_dists, init_idx))
    return lax.stop_gradient(idx)


def farthest_point_sample(
    npoint: int,
    points: jnp.ndarray,
    key: jax.Array | None = None,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Select ``npoint`` indices by farthest-point sampling.

    Signature order (npoint first) mirrors the reference wrapper
    ``farthest_point_sample(npoint, inp)`` (tf_ops/sampling/tf_sampling.py:48).

    Args:
      npoint: number of samples.
      points: (B, N, C) or (N, C) with xyz in the first 3 channels.
      key: optional PRNG key for a random start point (the CUDA kernel always
        starts at index 0; the host FPS in the eval pipeline starts randomly,
        evaluate_cloudAAE_ycbv.py:239).  None = start at 0 (or the first
        valid point when ``mask`` is given).
      mask: optional (B, N) / (N,) bool validity — padded points are never
        selected.
    Returns:
      int32 indices, (B, npoint) or (npoint,).
    """
    batched = points.ndim == 3
    b = points.shape[0] if batched else 1
    n = points.shape[-2]
    mask2 = None
    if mask is not None:
        mask2 = mask if batched else mask[None]
    pts2 = points if batched else points[None]
    if key is None:
        if mask2 is None:
            starts = jnp.zeros((b,), jnp.int32)
        else:
            starts = jnp.argmax(mask2, axis=-1).astype(jnp.int32)
    else:
        starts = jax.random.randint(key, (b,), 0, n, dtype=jnp.int32)
        if mask2 is not None:
            # snap a random start to the first valid point if it is invalid
            ok = jnp.take_along_axis(mask2, starts[:, None], axis=-1)[:, 0]
            starts = jnp.where(
                ok, starts, jnp.argmax(mask2, axis=-1).astype(jnp.int32)
            )
    if mask2 is None:
        idx = jax.vmap(lambda p, s: _fps_single(p, npoint, s))(pts2, starts)
    else:
        idx = jax.vmap(lambda p, s, m: _fps_single(p, npoint, s, m))(
            pts2, starts, mask2
        )
    return idx if batched else idx[0]
