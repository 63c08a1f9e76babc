"""Pallas TPU kernels for the blockwise nearest-neighbor distance op.

Fused replacements for both halves of ``ops.chamfer.nn_distance`` — the
TPU-native analogue of the reference's tiled CUDA kernels
(tf_ops/nn_distance/tf_nndistance_g.cu:5-151):

  * :func:`nn_min_argmin_pallas` — forward min+argmin.  Each (sample,
    row-chunk) grid cell holds its query rows and the FULL target cloud in
    VMEM and emits per-row min squared distance, argmin, and the argmin
    target's coordinates — the (chunk, M) distance tile lives only in VMEM
    (the CUDA kernel's shared-memory tiling, tf_nndistance_g.cu:5-127).
    Emitting the nearest-neighbor xyz directly (a max-mask reduction, same
    trick as ops.hpr_pallas) means the backward needs NO row gathers.
  * :func:`scatter_add_rows_pallas` — the backward's cross-term scatter-add
    (CUDA: atomicAdd, tf_nndistance_g.cu:132-151) as a dense one-hot
    reduction: out[j] = sum_i [idx_i == j] upd_i, computed per column chunk
    as three (chunk, K) masked FMA sums on the VPU.  Deterministic, no
    per-element scatters (SURVEY.md §5.2).

All pairwise terms are broadcast FMAs on the VPU ((chunk,1) x (1,M)) —
exact f32, sidestepping the MXU's bf16 default rounding (geometry-fatal,
see ops.hpr numerics note) and its tiny-K inefficiency at K=3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _min_argmin_kernel(
    y_t_ref,    # (1, 3, M) target cloud, transposed
    x_ref,      # (1, 1, CHUNK, 3) this chunk's query points
    dist_ref,   # out: (1, 1, CHUNK, 1) min squared distance
    idx_ref,    # out: (1, 1, CHUNK, 1) argmin (first occurrence)
    nn_ref,     # out: (1, 1, CHUNK, 3) coordinates of the argmin target
    *,
    m_actual: int,
    chunk: int,
    m: int,
):
    y0 = y_t_ref[0, 0:1, :]          # (1, M)
    y1 = y_t_ref[0, 1:2, :]
    y2 = y_t_ref[0, 2:3, :]
    x = x_ref[0, 0]                  # (CHUNK, 3)
    x0 = x[:, 0:1]
    x1 = x[:, 1:2]
    x2 = x[:, 2:3]

    inner = x0 * y0 + x1 * y1 + x2 * y2                 # (CHUNK, M) VPU FMAs
    y_sq = y0 * y0 + y1 * y1 + y2 * y2                  # (1, M)
    x_sq = x0 * x0 + x1 * x1 + x2 * x2                  # (CHUNK, 1)
    d = x_sq - 2.0 * inner + y_sq

    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, m), 1)
    if m_actual < m:                                    # static pad mask
        d = jnp.where(col < m_actual, d, jnp.inf)

    d_min = jnp.min(d, axis=1, keepdims=True)           # (CHUNK, 1)
    dist_ref[0, 0] = d_min
    # first-occurrence argmin, matching jnp.argmin tie-breaking
    idx = jnp.min(jnp.where(d == d_min, col, m), axis=1, keepdims=True)
    idx_ref[0, 0] = idx
    # gather y[idx] as an exact one-hot reduction (vectorizes where a
    # dynamic row gather would serialize)
    oh = (col == idx).astype(jnp.float32)
    nn_ref[0, 0] = jnp.concatenate(
        [
            jnp.sum(oh * y0, axis=1, keepdims=True),
            jnp.sum(oh * y1, axis=1, keepdims=True),
            jnp.sum(oh * y2, axis=1, keepdims=True),
        ],
        axis=1,
    )


def nn_min_argmin_pallas(
    x: jnp.ndarray,          # (B, N, 3) query points; N % chunk == 0
    y: jnp.ndarray,          # (B, M_pad, 3) target, columns >= m_actual padded
    m_actual: int,
    chunk: int = 256,
    interpret: bool = False,
):
    """Per-row (min squared distance, argmin, argmin-target xyz).

    Returns (dist (B, N) f32, idx (B, N) int32, nn (B, N, 3) f32).
    ``m_actual`` is the number of real target points; padded columns never
    win the min.
    """
    b, n, _ = x.shape
    m = y.shape[1]
    assert n % chunk == 0, (n, chunk)
    n_chunks = n // chunk

    y_t = jnp.swapaxes(y, -1, -2).astype(jnp.float32)    # (B, 3, M)
    x_rows = x.reshape(b, n_chunks, chunk, 3).astype(jnp.float32)

    kernel = functools.partial(
        _min_argmin_kernel, m_actual=m_actual, chunk=chunk, m=m
    )
    dist, idx, nn = pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 3, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, 3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, chunk, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, 3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_chunks, chunk, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n_chunks, chunk, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, n_chunks, chunk, 3), jnp.float32),
        ),
        interpret=interpret,
    )(y_t, x_rows)
    return dist.reshape(b, n), idx.reshape(b, n), nn.reshape(b, n, 3)


def _scatter_kernel(
    idx_ref,    # (1, 1, K) int32 target-row index per update
    u_t_ref,    # (1, 3, K) updates, transposed
    out_ref,    # out: (1, 1, CHUNK, 3) accumulated rows [j0, j0+CHUNK)
    *,
    chunk: int,
    k: int,
):
    j0 = pl.program_id(1) * chunk
    ids = idx_ref[0, 0:1, :]                             # (1, K)
    rows = j0 + jax.lax.broadcasted_iota(jnp.int32, (chunk, k), 0)
    oh = (ids == rows).astype(jnp.float32)               # (CHUNK, K)
    u0 = u_t_ref[0, 0:1, :]
    u1 = u_t_ref[0, 1:2, :]
    u2 = u_t_ref[0, 2:3, :]
    out_ref[0, 0] = jnp.concatenate(
        [
            jnp.sum(oh * u0, axis=1, keepdims=True),
            jnp.sum(oh * u1, axis=1, keepdims=True),
            jnp.sum(oh * u2, axis=1, keepdims=True),
        ],
        axis=1,
    )


def scatter_add_rows_pallas(
    idx: jnp.ndarray,        # (B, K) int32; out-of-range entries are dropped
    upd: jnp.ndarray,        # (B, K, 3) f32
    n_rows: int,
    chunk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[b, j] = sum_i [idx[b, i] == j] upd[b, i], shape (B, n_rows, 3).

    Matches ``zeros(n_rows, 3).at[idx].add(upd, mode="drop")``.
    """
    b, k = idx.shape
    n_pad = -(-n_rows // chunk) * chunk
    n_chunks = n_pad // chunk

    idx3 = idx.reshape(b, 1, k)
    u_t = jnp.swapaxes(upd, -1, -2).astype(jnp.float32)  # (B, 3, K)

    kernel = functools.partial(_scatter_kernel, chunk=chunk, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, 3), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, chunk, 3), jnp.float32),
        interpret=interpret,
    )(idx3, u_t)
    return out.reshape(b, n_pad, 3)[:, :n_rows]
