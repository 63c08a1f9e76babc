"""Fused Pallas TPU kernels for the DGCNN edge convolution.

The XLA formulation of one EdgeConv block (models/dgcnn.py) materializes a
(B, N*k, N) one-hot operand in HBM to run the neighbor gather on the MXU,
then a (B, N, k, F) edge tensor for BN -> relu -> mean-over-k.  At the
production shapes (B=128, N=256, k=10) those intermediates dominate the
block's HBM traffic.  These kernels keep the whole per-sample chain

    split conv -> neighbor select -> +/- center -> BN affine -> relu -> mean_k

in VMEM: the neighbor selection is a per-slot (N, N) one-hot matmul whose
operand is *built in registers* from the kNN index row (never stored), and
the per-edge activations live only as a (N, F) tile inside the unrolled
k-loop.  This is the TPU-native replacement for the reference's
materialized edge features + flat ``tf.gather`` (utils/tf_util.py:635-669)
and the 1x1 edge conv (models/pointnet_ycb_23_decoder_4.py:337-350).

Batch-norm statistics reduce over (B, N, k) — a cross-sample reduction no
single grid cell can see — so training uses two passes:

  * :func:`edge_conv_moments` — per-sample sums of the pre-BN activations
    and their squares ((B, F) each); the caller turns them into the batch
    mean/var and the EMA update (tf_util.batch_norm_template semantics).
  * :func:`edge_conv_mean` — recomputes the edges (cheap MXU work beats an
    HBM round-trip) and applies the folded BN affine + relu + mean-over-k.

Both are custom-VJP ops whose backward kernels emit per-point cotangents
``g_a``/``g_v`` (the split-conv outputs); the weight/input gradients are
then two small einsums outside the kernel.  The gather's transpose — the
CUDA-era scatter-add — is another in-register one-hot matmul
(deterministic, SURVEY.md §5.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _split_conv(x_ref, w_ref, b_ref, cdt):
    """a = x @ W_c + bias, v = x @ W_n with the XLA path's rounding: bf16
    operands, f32 accumulation, result rounded back to the compute dtype."""
    x = x_ref[0].astype(cdt)                     # (N, C)
    c = x.shape[-1]
    w = w_ref[...].astype(cdt)                   # (2C, F)
    a = jnp.dot(x, w[:c], preferred_element_type=jnp.float32)
    v = jnp.dot(x, w[c:], preferred_element_type=jnp.float32)
    a = (a.astype(cdt) + b_ref[0].astype(cdt)).astype(cdt)
    return a, v.astype(cdt)


def _sel(idx_ref, j, n, dtype):
    """Neighbor-slot-j selection matrix, built in registers: sel[i, m] = 1
    iff m == nn_idx[i, j].  ``sel @ v`` is the gather; ``sel.T @ g`` its
    transpose (the CUDA era's atomicAdd scatter, now a deterministic
    matmul)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (col == idx_ref[0, :, j:j + 1]).astype(dtype)


def _moments_kernel(x_ref, w_ref, b_ref, idx_ref, s1_ref, s2_ref, *, k, cdt):
    n = x_ref.shape[1]
    a, v = _split_conv(x_ref, w_ref, b_ref, cdt)
    s1 = jnp.zeros((1, a.shape[-1]), jnp.float32)
    s2 = jnp.zeros((1, a.shape[-1]), jnp.float32)
    for j in range(k):
        nbr = jnp.dot(_sel(idx_ref, j, n, cdt), v,
                      preferred_element_type=jnp.float32).astype(cdt)
        pre = (a + nbr - v).astype(jnp.float32)          # (N, F)
        s1 = s1 + jnp.sum(pre, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(pre * pre, axis=0, keepdims=True)
    s1_ref[0] = s1
    s2_ref[0] = s2


def _mean_kernel(x_ref, w_ref, b_ref, sc_ref, sh_ref, idx_ref, out_ref,
                 *, k, cdt):
    n = x_ref.shape[1]
    a, v = _split_conv(x_ref, w_ref, b_ref, cdt)
    sc = sc_ref[0]                                       # (F,) f32
    sh = sh_ref[0]
    acc = jnp.zeros((n, a.shape[-1]), jnp.float32)
    for j in range(k):
        nbr = jnp.dot(_sel(idx_ref, j, n, cdt), v,
                      preferred_element_type=jnp.float32).astype(cdt)
        pre = (a + nbr - v).astype(jnp.float32)
        e = jnp.maximum(pre * sc + sh, 0.0).astype(cdt)  # BN affine + relu
        acc = acc + e.astype(jnp.float32)
    out_ref[0] = (acc / k).astype(out_ref.dtype)


def _mean_bwd_kernel(x_ref, w_ref, b_ref, sc_ref, sh_ref, idx_ref, g_ref,
                     ga_ref, gv_ref, gsc_ref, gsh_ref, *, k, cdt):
    n = x_ref.shape[1]
    a, v = _split_conv(x_ref, w_ref, b_ref, cdt)
    sc = sc_ref[0]
    sh = sh_ref[0]
    g = g_ref[0].astype(jnp.float32) / k                 # d mean/d e = 1/k
    f = a.shape[-1]
    ga = jnp.zeros((n, f), jnp.float32)
    gv = jnp.zeros((n, f), jnp.float32)
    gsc = jnp.zeros((1, f), jnp.float32)
    gsh = jnp.zeros((1, f), jnp.float32)
    vf = v.astype(jnp.float32)
    for j in range(k):
        sel = _sel(idx_ref, j, n, jnp.float32)
        nbr = jnp.dot(sel, vf, preferred_element_type=jnp.float32).astype(cdt)
        pre = (a + nbr - v).astype(jnp.float32)
        gz = jnp.where(pre * sc + sh > 0.0, g, 0.0)      # relu mask
        gsc = gsc + jnp.sum(gz * pre, axis=0, keepdims=True)
        gsh = gsh + jnp.sum(gz, axis=0, keepdims=True)
        gp = gz * sc                                     # (N, F) d/d pre
        ga = ga + gp
        gv = gv - gp + jnp.dot(sel.T, gp,
                               preferred_element_type=jnp.float32)
    ga_ref[0] = ga
    gv_ref[0] = gv
    gsc_ref[0] = gsc
    gsh_ref[0] = gsh


def _moments_bwd_kernel(x_ref, w_ref, b_ref, idx_ref, gs1_ref, gs2_ref,
                        ga_ref, gv_ref, *, k, cdt):
    n = x_ref.shape[1]
    a, v = _split_conv(x_ref, w_ref, b_ref, cdt)
    gs1 = gs1_ref[0]                                     # (1, F) f32
    gs2 = gs2_ref[0]
    f = a.shape[-1]
    ga = jnp.zeros((n, f), jnp.float32)
    gv = jnp.zeros((n, f), jnp.float32)
    vf = v.astype(jnp.float32)
    for j in range(k):
        sel = _sel(idx_ref, j, n, jnp.float32)
        nbr = jnp.dot(sel, vf, preferred_element_type=jnp.float32).astype(cdt)
        pre = (a + nbr - v).astype(jnp.float32)
        gp = gs1 + 2.0 * pre * gs2                       # d(s1 + s2)/d pre
        ga = ga + gp
        gv = gv - gp + jnp.dot(sel.T, gp,
                               preferred_element_type=jnp.float32)
    ga_ref[0] = ga
    gv_ref[0] = gv


def _specs(b, n, c, f, k, *extra):
    """Common in_specs: x (1,N,C), kernel (2C,F), bias (1,F), [extra (1,F)
    rows...], idx (1,N,k)."""
    per_b = lambda i: (i, 0, 0)
    whole2 = lambda i: (0, 0)
    specs = [
        pl.BlockSpec((1, n, c), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * c, f), whole2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f), whole2, memory_space=pltpu.VMEM),
    ]
    for _ in extra:
        specs.append(pl.BlockSpec((1, f), whole2, memory_space=pltpu.VMEM))
    specs.append(pl.BlockSpec((1, n, k), per_b, memory_space=pltpu.VMEM))
    return specs


def _point_grads_to_inputs(x, kernel, ga, gv, cdt):
    """Fold per-point cotangents (g_a, g_v) into (g_x, g_kernel, g_bias).

    a = cast(x) @ W_c + bias and v = cast(x) @ W_n, so these are three
    batched einsums — MXU work, no scatters.
    """
    c = x.shape[-1]
    xf = x.astype(cdt).astype(jnp.float32)
    g_wc = jnp.einsum("bnc,bnf->cf", xf, ga,
                      precision=jax.lax.Precision.HIGHEST)
    g_wn = jnp.einsum("bnc,bnf->cf", xf, gv,
                      precision=jax.lax.Precision.HIGHEST)
    g_bias = jnp.sum(ga, axis=(0, 1))
    w = kernel.astype(jnp.float32)
    g_x = jnp.einsum("bnf,cf->bnc", ga, w[:c],
                     precision=jax.lax.Precision.HIGHEST) + jnp.einsum(
        "bnf,cf->bnc", gv, w[c:], precision=jax.lax.Precision.HIGHEST)
    return (
        g_x.astype(x.dtype),
        jnp.concatenate([g_wc, g_wn], axis=0).astype(kernel.dtype),
        g_bias,
    )


def _int_zero(a):
    return np.zeros(a.shape, dtype=jax.dtypes.float0)


# ---------------------------------------------------------------------------
# edge_conv_moments
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def edge_conv_moments(x, kernel, bias, nn_idx, compute_dtype="float32"):
    """Per-sample sums of the pre-BN edge activations and their squares.

    Args:
      x: (B, N, C) features.  kernel: (2C, F) split edge weight
        (models/dgcnn.py _SplitEdgeKernel).  bias: (F,).
      nn_idx: (B, N, k) int32 kNN indices (ops.knn.knn_indices).
    Returns:
      (s1, s2): (B, F) f32 sums over the N*k edges of each sample —
      ``mean = s1.sum(0)/(B*N*k)``, ``var = s2.sum(0)/(B*N*k) - mean**2``
      reproduce tf.nn.moments over (B, N, k) (utils/tf_util.py:497).
    """
    return _moments_impl(x, kernel, bias, nn_idx, compute_dtype)


def _moments_impl(x, kernel, bias, nn_idx, compute_dtype):
    b, n, c = x.shape
    f = kernel.shape[-1]
    k = nn_idx.shape[-1]
    cdt = jnp.dtype(compute_dtype)
    # Per-sample rows live as (B, 1, F) so each grid cell's block keeps its
    # last two dims equal to the array's (the TPU lowering's tiling rule —
    # a (1, F) block over a (B, F) array is rejected).
    s1, s2 = pl.pallas_call(
        functools.partial(_moments_kernel, k=k, cdt=cdt),
        grid=(b,),
        in_specs=_specs(b, n, c, f, k),
        out_specs=(
            pl.BlockSpec((1, 1, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
        ),
        interpret=_interpret(),
    )(x, kernel, bias.reshape(1, f), nn_idx.astype(jnp.int32))
    return s1.reshape(b, f), s2.reshape(b, f)


def _moments_fwd(x, kernel, bias, nn_idx, compute_dtype):
    return _moments_impl(x, kernel, bias, nn_idx, compute_dtype), (
        x, kernel, bias, nn_idx,
    )


def _moments_bwd(compute_dtype, res, g):
    x, kernel, bias, nn_idx = res
    gs1, gs2 = g
    b, n, c = x.shape
    f = kernel.shape[-1]
    k = nn_idx.shape[-1]
    cdt = jnp.dtype(compute_dtype)
    per_b = lambda i: (i, 0, 0)
    ga, gv = pl.pallas_call(
        functools.partial(_moments_bwd_kernel, k=k, cdt=cdt),
        grid=(b,),
        in_specs=_specs(b, n, c, f, k) + [
            pl.BlockSpec((1, 1, f), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), per_b, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, f), jnp.float32),
            jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        ),
        interpret=_interpret(),
    )(x, kernel, bias.reshape(1, f), nn_idx.astype(jnp.int32),
      gs1.astype(jnp.float32).reshape(b, 1, f),
      gs2.astype(jnp.float32).reshape(b, 1, f))
    g_x, g_kernel, g_bias = _point_grads_to_inputs(x, kernel, ga, gv, cdt)
    return g_x, g_kernel, g_bias, _int_zero(nn_idx)


edge_conv_moments.defvjp(_moments_fwd, _moments_bwd)


# ---------------------------------------------------------------------------
# edge_conv_mean
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def edge_conv_mean(x, kernel, bias, scale, shift, nn_idx,
                   compute_dtype="float32"):
    """Fused edge conv with mean aggregation.

    out[b, i] = mean_j relu(scale * pre[b, i, j] + shift) where
    pre = a_i + v_{idx[i,j]} - v_i (the split edge conv) and (scale, shift)
    is the folded BN affine ``(gamma/sqrt(var+eps), beta - mean*that)``.
    Returns (B, N, F) in the compute dtype.
    """
    return _mean_impl(x, kernel, bias, scale, shift, nn_idx, compute_dtype)


def _mean_impl(x, kernel, bias, scale, shift, nn_idx, compute_dtype):
    b, n, c = x.shape
    f = kernel.shape[-1]
    k = nn_idx.shape[-1]
    cdt = jnp.dtype(compute_dtype)
    return pl.pallas_call(
        functools.partial(_mean_kernel, k=k, cdt=cdt),
        grid=(b,),
        in_specs=_specs(b, n, c, f, k, "scale", "shift"),
        out_specs=pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, f), cdt),
        interpret=_interpret(),
    )(x, kernel, bias.reshape(1, f), scale.reshape(1, f).astype(jnp.float32),
      shift.reshape(1, f).astype(jnp.float32), nn_idx.astype(jnp.int32))


def _mean_fwd(x, kernel, bias, scale, shift, nn_idx, compute_dtype):
    out = _mean_impl(x, kernel, bias, scale, shift, nn_idx, compute_dtype)
    return out, (x, kernel, bias, scale, shift, nn_idx)


def _mean_bwd(compute_dtype, res, g):
    x, kernel, bias, scale, shift, nn_idx = res
    b, n, c = x.shape
    f = kernel.shape[-1]
    k = nn_idx.shape[-1]
    cdt = jnp.dtype(compute_dtype)
    ga, gv, gsc, gsh = pl.pallas_call(
        functools.partial(_mean_bwd_kernel, k=k, cdt=cdt),
        grid=(b,),
        in_specs=_specs(b, n, c, f, k, "scale", "shift") + [
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, f), jnp.float32),
            jax.ShapeDtypeStruct((b, n, f), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
        ),
        interpret=_interpret(),
    )(x, kernel, bias.reshape(1, f),
      scale.reshape(1, f).astype(jnp.float32),
      shift.reshape(1, f).astype(jnp.float32),
      nn_idx.astype(jnp.int32), g.astype(jnp.float32))
    g_x, g_kernel, g_bias = _point_grads_to_inputs(x, kernel, ga, gv, cdt)
    return (
        g_x, g_kernel, g_bias,
        jnp.sum(gsc, axis=(0, 1)).astype(scale.dtype),
        jnp.sum(gsh, axis=(0, 1)).astype(shift.dtype),
        _int_zero(nn_idx),
    )


edge_conv_mean.defvjp(_mean_fwd, _mean_bwd)


def edge_conv_mean_reference(x, kernel, bias, scale, shift, nn_idx,
                             compute_dtype="float32"):
    """Pure-jnp oracle with the same rounding schedule (tests)."""
    cdt = jnp.dtype(compute_dtype)
    c = x.shape[-1]
    xc = x.astype(cdt)
    w = kernel.astype(cdt)
    a = (xc @ w[:c]).astype(cdt) + bias.astype(cdt)
    v = (xc @ w[c:]).astype(cdt)
    nbr = jax.vmap(lambda vb, ib: vb[ib])(v, nn_idx)   # (B, N, k, F)
    pre = (a[:, :, None, :] + nbr - v[:, :, None, :]).astype(jnp.float32)
    e = jnp.maximum(pre * scale + shift, 0.0).astype(cdt)
    return jnp.mean(e.astype(jnp.float32), axis=2).astype(cdt)
