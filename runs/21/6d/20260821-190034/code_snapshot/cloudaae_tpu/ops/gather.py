"""Point gathering and inverse-CDF sampling.

Replaces the reference's ``GatherPoint``/``GatherPointGrad`` CUDA kernels
(tf_ops/sampling/tf_sampling_g.cu:172-192) and ``ProbSample`` (cumsum +
binary search, :7-104).  On TPU these are one-liners: ``take_along_axis``
differentiates to a deterministic scatter-add automatically (the CUDA grad
kernel's atomicAdd semantics for free), and prob_sample is
``cumsum + searchsorted``.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather points by index: (B, N, C), (B, K) -> (B, K, C).

    Mirrors ``gather_point`` (tf_ops/sampling/tf_sampling.py:30-46); JAX
    autodiff supplies the scatter-add gradient the reference implements by
    hand (tf_sampling_g.cu:185-192).
    """
    from cloudaae_tpu.ops.knn import gather_rows

    return gather_rows(points, idx)


def prob_sample(inp: jnp.ndarray, inpr: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF categorical sampling.

    Mirrors ``prob_sample(inp, inpr)`` (tf_ops/sampling/tf_sampling.py:13-28):
    ``inp`` (B, N) unnormalized probabilities, ``inpr`` (B, M) uniform [0,1)
    samples; returns (B, M) int32 category indices.
    """
    cdf = jnp.cumsum(inp, axis=-1)
    cdf = cdf / cdf[..., -1:]
    idx = jnp.sum(inpr[..., :, None] >= cdf[..., None, :], axis=-1)
    return jnp.clip(idx, 0, inp.shape[-1] - 1).astype(jnp.int32)
