"""Bidirectional nearest-neighbor distance (Chamfer) with a custom VJP.

TPU-native replacement for the reference's ``NnDistance``/``NnDistanceGrad``
custom op (tf_ops/nn_distance/tf_nndistance.cpp:3-9, CUDA kernels
tf_nndistance_g.cu:5-151) and ``losses/chamfer_loss.py:8-14``.

Design:
  * Forward (TPU): a fused Pallas kernel (ops.chamfer_pallas) computes the
    per-row min+argmin with the (chunk, M) distance tile resident in VMEM —
    the analogue of the CUDA kernel's shared-memory tiling
    (tf_nndistance_g.cu:5-127), never materializing the (B, N, M) matrix.
  * Forward (other backends): the O(N*M) pairwise squared-distance matrix is
    one (N,3)x(3,M) matmul plus row/col norms, row-chunked under ``lax.map``
    so the live footprint is (chunk, M).
  * Arbitrary point counts: rows are padded to the chunk size and sliced
    off; padded target columns are masked inside the kernel — no
    multiple-of-256 requirement on callers.
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

# Row-chunk size; 256 rows x M cols stays well under VMEM limits for M up
# to ~16k in both the Pallas kernel and the fused-jnp fallback.
_CHUNK = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_axis(x: jnp.ndarray, axis: int, target: int) -> jnp.ndarray:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _min_argmin_jnp(x: jnp.ndarray, y: jnp.ndarray, chunk: int):
    """Per-row min and argmin of squared distances, x:(B,N,3) y:(B,M,3)."""
    b, n, _ = x.shape

    def one_chunk(xc, yt, y_sq):
        # (chunk, M) distances; the -2*x@yT matmul dominates and hits the MXU.
        d = (
            jnp.sum(jnp.square(xc), axis=-1, keepdims=True)
            - 2.0 * jnp.matmul(xc, yt, precision=lax.Precision.HIGHEST)
            + y_sq[None, :]
        )
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)

    def one_sample(xs, ys):
        y_sq = jnp.sum(jnp.square(ys), axis=-1)                   # (M,)
        yt = ys.T                                                 # (3, M)
        if n <= chunk:
            return one_chunk(xs, yt, y_sq)
        n_pad = _round_up(n, chunk)
        xs = _pad_axis(xs, 0, n_pad)
        dist, idx = lax.map(
            lambda xc: one_chunk(xc, yt, y_sq),
            xs.reshape(n_pad // chunk, chunk, 3),
        )
        return dist.reshape(n_pad)[:n], idx.reshape(n_pad)[:n]

    return jax.vmap(one_sample)(x, y)


def _min_argmin_pallas(x: jnp.ndarray, y: jnp.ndarray, chunk: int):
    from cloudaae_tpu.ops.chamfer_pallas import nn_min_argmin_pallas

    n = x.shape[1]
    m = y.shape[1]
    chunk = min(chunk, _round_up(n, 8))
    m_pad = _round_up(m, 128)
    # scoped-VMEM budget: the kernel keeps ~one (chunk, M) f32 distance
    # tile (plus iota/one-hot temps) on the stack; the TPU scoped limit is
    # 16 MB and chunk=256 x M=16384 was measured to OOM at 18.36 MB.  Cap
    # the row chunk so chunk*M*4B <= 8 MB (half the limit, leaving room
    # for the temps); M <= 8192 keeps the default chunk unchanged.
    vmem_rows = max(8, (2 * 1024 * 1024 // m_pad) // 8 * 8)
    chunk = min(chunk, vmem_rows)
    n_pad = _round_up(n, chunk)
    dist, idx, nn = nn_min_argmin_pallas(
        _pad_axis(x, 1, n_pad), _pad_axis(y, 1, m_pad), m_actual=m, chunk=chunk
    )
    return dist[:, :n], idx[:, :n], nn[:, :n]


def _gather_rows(x, idx):
    # per-sample take(axis=0) lowers to row-slice gathers (fast on TPU)
    return jax.vmap(lambda xb, ib: jnp.take(xb, ib, axis=0))(x, idx)


def _min_argmin(x: jnp.ndarray, y: jnp.ndarray, use_pallas: bool):
    """dist, argmin idx, and y[idx] (the argmin target's coordinates)."""
    if use_pallas:
        return _min_argmin_pallas(x, y, _CHUNK)
    d, i = _min_argmin_jnp(x, y, _CHUNK)
    return d, i, _gather_rows(y, i)


def _nn_distance_fwd_impl(x1, x2, use_pallas: bool):
    d1, i1, nn1 = _min_argmin(x1, x2, use_pallas)
    d2, i2, nn2 = _min_argmin(x2, x1, use_pallas)
    return (d1, i1, d2, i2), (nn1, nn2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _nn_distance(x1: jnp.ndarray, x2: jnp.ndarray, use_pallas: bool):
    return _nn_distance_fwd_impl(x1, x2, use_pallas)[0]


def _nn_distance_fwd(x1, x2, use_pallas):
    out, (nn1, nn2) = _nn_distance_fwd_impl(x1, x2, use_pallas)
    _, i1, _, i2 = out
    return out, (x1, x2, i1, i2, nn1, nn2)


def _scatter_add_rows(idx, updates, n_rows: int, use_pallas: bool):
    if use_pallas:
        from cloudaae_tpu.ops.chamfer_pallas import scatter_add_rows_pallas

        return scatter_add_rows_pallas(idx, updates, n_rows)
    return jax.vmap(
        lambda ib, ub: jnp.zeros((n_rows, updates.shape[-1]), updates.dtype)
        .at[ib]
        .add(ub, mode="drop")
    )(idx, updates)


def _nn_distance_bwd(use_pallas, res, g):
    x1, x2, i1, i2, nn1, nn2 = res
    g1, _, g2, _ = g  # cotangents of the integer argmin outputs are ignored
    # dist1_i = |x1_i - x2_{i1_i}|^2  -> dx1_i += 2 g1_i (x1_i - x2_{i1_i})
    #                                    dx2_{i1_i} -= 2 g1_i (x1_i - x2_{i1_i})
    # The forward saved nn1 = x2[i1], nn2 = x1[i2], so no gathers here; the
    # cross-term scatters are one-hot reductions on TPU (chamfer_pallas).
    diff1 = 2.0 * g1[..., None] * (x1 - nn1)
    diff2 = 2.0 * g2[..., None] * (x2 - nn2)
    dx1 = diff1 - _scatter_add_rows(i2, diff2, x1.shape[1], use_pallas)
    dx2 = diff2 - _scatter_add_rows(i1, diff1, x2.shape[1], use_pallas)
    return dx1, dx2


_nn_distance.defvjp(_nn_distance_fwd, _nn_distance_bwd)


def nn_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray, use_pallas: bool | None = None):
    """Bidirectional NN squared distances, batched.

    Mirrors the Python wrapper contract ``nn_distance(xyz1, xyz2) ->
    (dist1, idx1, dist2, idx2)`` (tf_ops/nn_distance/tf_nndistance.py:14-24).

    Args:
      xyz1: (..., N, 3).
      xyz2: (..., M, 3) with matching leading dims.
      use_pallas: None = auto (fused Pallas kernel on TPU, chunked jnp on
        other backends).
    Returns:
      dist1 (..., N): squared distance from each xyz1 point to its nearest
        xyz2 point; idx1 (..., N) int32 index of that point; dist2/idx2
        the reverse direction.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    lead = xyz1.shape[:-2]
    n, m = xyz1.shape[-2], xyz2.shape[-2]
    x1 = xyz1.reshape(-1, n, 3) if lead != () else xyz1[None]
    x2 = xyz2.reshape(-1, m, 3) if lead != () else xyz2[None]
    d1, i1, d2, i2 = _nn_distance(x1, x2, use_pallas)
    return (
        d1.reshape(*lead, n),
        i1.reshape(*lead, n),
        d2.reshape(*lead, m),
        i2.reshape(*lead, m),
    )


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
