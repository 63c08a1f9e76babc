"""Mesh-surface point sampling — area-weighted triangle sampling.

Capability parity with the reference sampling op's demo
(tf_ops/sampling/tf_sampling.py:60-89): sample points uniformly over a
triangle mesh's surface by drawing triangles with probability proportional
to area (``prob_sample``) and then uniform barycentric coordinates; usually
followed by :func:`cloudaae_tpu.ops.farthest_point_sample`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cloudaae_tpu.ops.gather import prob_sample


def triangle_areas(vertices: jnp.ndarray, triangles: jnp.ndarray) -> jnp.ndarray:
    """(V, 3), (T, 3) int -> (T,) areas."""
    a = vertices[triangles[:, 0]]
    b = vertices[triangles[:, 1]]
    c = vertices[triangles[:, 2]]
    return 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)


def sample_mesh_surface(
    vertices: jnp.ndarray,
    triangles: jnp.ndarray,
    n: int,
    key: jax.Array,
) -> jnp.ndarray:
    """Uniformly sample ``n`` points on a triangle mesh's surface.

    Equivalent to the reference demo chain: per-triangle areas -> inverse-CDF
    triangle choice (the ``prob_sample`` op) -> uniform barycentric point.

    Returns (n, 3).
    """
    k1, k2 = jax.random.split(key)
    areas = triangle_areas(vertices, triangles)
    u = jax.random.uniform(k1, (1, n))
    tri_idx = prob_sample(areas[None], u)[0]                   # (n,)
    tri = triangles[tri_idx]                                   # (n, 3)
    a = vertices[tri[:, 0]]
    b = vertices[tri[:, 1]]
    c = vertices[tri[:, 2]]
    # uniform barycentric via sqrt trick
    r = jax.random.uniform(k2, (n, 2))
    s = jnp.sqrt(r[:, :1])
    t = r[:, 1:]
    return (1 - s) * a + s * (1 - t) * b + s * t * c
