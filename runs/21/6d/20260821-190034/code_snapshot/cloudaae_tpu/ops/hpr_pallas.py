"""Pallas TPU kernel for the HPR support-margin ascent.

Fuses the entire Polyak-ascent iteration loop of ops.hpr.hpr_visible_mask
into one kernel per (sample, row-chunk) grid cell: the flipped cloud
(N x 3 ~ 30 KB) and all loop state live in VMEM for all iterations, so HBM
sees each point exactly once instead of once per iteration.

Support values are computed as three broadcast FMAs on the VPU
((chunk,1) x (1,N)) — exact f32, sidestepping both the MXU's bf16 default
rounding (fatal here, see ops.hpr numerics note) and its tiny-K
inefficiency at K=3.  The argmax gather ``f[q*]`` is replaced by a
max-mask reduction (one-hot(sup == max) contracted against f's coordinate
planes), which vectorizes where a dynamic gather would serialize.

The public entry :func:`hpr_best_margin_pallas` consumes pre-sorted inputs
from ops.hpr and returns the per-point best margins; everything else
(flip, sorting, margin threshold, resampling) stays in ops.hpr.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ascent_kernel(
    f_t_ref,      # (3, N) flipped cloud, transposed, depth-sorted
    f_c_ref,      # (CHUNK, 3) this chunk's flipped points
    d_ref,        # (CHUNK, 3) initial directions (unit)
    best_ref,     # out: (CHUNK,) best margins  -> stored as (CHUNK, 1)
    *,
    iters: int,
    chunk: int,
    n: int,
):
    f0 = f_t_ref[0, 0:1, :]  # (1, N)
    f1 = f_t_ref[0, 1:2, :]
    f2 = f_t_ref[0, 2:3, :]
    f_c = f_c_ref[0, 0]      # (CHUNK, 3)

    def margin_of(d):
        d0 = d[:, 0:1]
        d1 = d[:, 1:2]
        d2 = d[:, 2:3]
        supp = d0 * f0 + d1 * f1 + d2 * f2          # (CHUNK, N) VPU FMAs
        # The max runs over ALL columns including self: if p is its own
        # argmax its margin is exactly 0 (>= -slack -> visible) and the
        # subgradient vanishes, freezing an already-won trajectory — the
        # decision is identical to the self-excluded test at any slack >= 0,
        # without building or applying an exclusion mask.
        m = jnp.max(supp, axis=1, keepdims=True)     # (CHUNK, 1)
        own = jnp.sum(d * f_c, axis=1, keepdims=True)
        return supp, m, own - m

    def body(_, state):
        d, best = state
        supp, m, margin = margin_of(d)
        best = jnp.maximum(best, margin)
        # f[q*] via max-mask reduction (ties averaged — same subgradient set)
        oh = (supp == m).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(oh, axis=1, keepdims=True), 1.0)
        fs0 = jnp.sum(oh * f0, axis=1, keepdims=True) / cnt
        fs1 = jnp.sum(oh * f1, axis=1, keepdims=True) / cnt
        fs2 = jnp.sum(oh * f2, axis=1, keepdims=True) / cnt
        g = f_c - jnp.concatenate([fs0, fs1, fs2], axis=1)
        gn = jnp.sum(g * g, axis=1, keepdims=True) + 1e-20
        eta = 1.5 * jnp.maximum(-margin, 0.0) / gn + 1e-3
        d_new = d + eta * g
        norm = jnp.sqrt(jnp.maximum(jnp.sum(d_new * d_new, axis=1, keepdims=True), 1e-20))
        return d_new / norm, best

    best0 = jnp.full((chunk, 1), -jnp.inf, jnp.float32)
    # the direction produced by the last ascent step is only ever *scored*,
    # never stepped again: run iters-1 full iterations, then one margin-only
    # evaluation — skipping the dead argmax-reduction/step/renormalize work
    d, best = lax.fori_loop(0, iters - 1, body, (d_ref[0, 0], best0))
    _, _, margin = margin_of(d)
    best_ref[0, 0] = jnp.maximum(best, margin)


@functools.partial(
    jax.jit, static_argnames=("iters", "chunk", "num_rows", "interpret")
)
def hpr_best_margin_pallas(
    f_sorted: jnp.ndarray,   # (B, N, 3) normalized flipped cloud
    d0_sorted: jnp.ndarray,  # (B, N, 3) unit start directions, same order
    iters: int,
    chunk: int = 128,
    num_rows: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-point best support margins, (B, num_rows or N).

    ``num_rows`` restricts the *row* side (which points get a visibility
    margin) to the first ``num_rows`` points; the *column* side (the
    competitor set every margin is measured against) always stays the full
    cloud, so restricted rows see exactly the margins they would in the
    full computation.
    """
    b, n, _ = f_sorted.shape
    k = n if num_rows is None else num_rows
    assert n % chunk == 0, (n, chunk)
    assert k % chunk == 0 and 0 < k <= n, (k, n, chunk)
    n_chunks = k // chunk

    f_t = jnp.swapaxes(f_sorted, -1, -2)                     # (B, 3, N)
    f_rows = f_sorted[:, :k].reshape(b, n_chunks, chunk, 3)
    d_rows = d0_sorted[:, :k].reshape(b, n_chunks, chunk, 3)

    kernel = functools.partial(
        _ascent_kernel, iters=iters, chunk=chunk, n=n
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, 3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, 3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, 1), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, chunk, 1), jnp.float32),
        interpret=interpret,
    )(f_t, f_rows, d_rows)
    return out.reshape(b, k)