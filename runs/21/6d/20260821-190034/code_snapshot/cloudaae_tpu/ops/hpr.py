"""Hidden point removal (HPR) — ConvexHull-free, fully on-device.

The reference implements Katz et al.'s HPR operator as a TF spherical flip
followed by a *host* ``scipy.spatial.ConvexHull`` inside ``tf.py_func``
(utils/hidden_point_removal.py:6-48) — the single host-bound bottleneck of
its training pipeline (SURVEY.md §3.1).  This module replaces the hull with
an equivalent test that is pure matmul + elementwise work on device.

Reformulation.  The spherical flip maps p to ``f(p) = s(p) * p_hat`` with
flipped radius ``s(p) = 2R - |p|`` (direction preserved).  A point is
HPR-visible iff f(p) is a vertex of the convex hull of the flipped cloud
plus the origin, i.e. iff f(p) maximizes the support function in *some*
direction d:

    visible(p)  <=>  max_{|d|<=1}  [ <f(p), d> - max_q <f(q), d> ]  >  0

The bracketed margin m_p(d) is *concave* in d (linear minus a max of
linears), so the inner maximization is a global concave problem solved by
projected subgradient ascent from the warm start d = p_hat:

    q* = argmax_q <f(q), d>;   d <- normalize(d + eta_k (f(p) - f(q*)))

Each iteration for all N points at once is one (N,3)x(3,N) matmul + row max
— the same O(N^2) shape as the Chamfer kernel.  With Polyak step sizing,
8-12 iterations reach ~0.97 visibility IoU against the exact scipy hull
oracle (tests/test_hpr.py); iterations are a quality/speed knob
(config.SynthConfig.hpr_iters).  On TPU the loop runs as a fused Pallas
kernel (ops.hpr_pallas) with the cloud resident in VMEM.

Numerics: margins live at ~1e-6 relative to the flip radius (the reference's
R = max|p| * 10^(0.8*pi) is ~326x the scene scale), so the matmul must run
at ``Precision.HIGHEST`` — f32 then leaves ~16x headroom; bf16 MXU rounding
would destroy the test.

The fixed-size resampling contract of the reference's ``convexHull``
(utils/hidden_point_removal.py:38-41) is preserved exactly: output = visible
points in ascending original-index order, padded to a fixed size with random
choices among the visible set — so downstream ``[:, :NUM_POINT]`` slicing
(train_cloudAAE_ycbv.py:213-214) selects the same population.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_ROW_CHUNK = 256
DEFAULT_ITERS = 12


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def spherical_flip(
    points: jnp.ndarray,
    param: float,
    mask: jnp.ndarray | None = None,
):
    """Katz spherical flip about the origin.

    Mirrors ``sphericalFlip`` (utils/hidden_point_removal.py:6-24) with
    center = 0 (all reference call sites pass a zero center,
    train_cloudAAE_ycbv.py:103-105): ``R = max|p| * 10**param`` and
    ``f(p) = p + 2 (R - |p|) p / |p|``.

    Args:
      points: (N, 3).
      param: flip exponent (0.8*pi in the reference).
      mask: optional (N,) bool validity mask (padding support).
    Returns:
      (flipped (N, 3), flipped_radius s (N,), unit_dirs (N, 3), norms (N,)).
    """
    norms = jnp.linalg.norm(points, axis=-1)
    valid = jnp.ones_like(norms, bool) if mask is None else mask
    safe = jnp.where(norms > 0, norms, 1.0)
    radius = jnp.max(jnp.where(valid, norms, 0.0)) * (10.0 ** param)
    s = 2.0 * radius - norms
    dirs = points / safe[..., None]
    flipped = dirs * s[..., None]
    return flipped, s, dirs, norms


def hpr_visible_mask(
    points: jnp.ndarray,
    param: float,
    mask: jnp.ndarray | None = None,
    iters: int = DEFAULT_ITERS,
    slack: float = 2e-4,
    row_chunk: int = _ROW_CHUNK,
    use_pallas: bool | None = None,
    num_test_rows: int | None = None,
) -> jnp.ndarray:
    """HPR visibility from the origin via support-margin ascent.

    Polyak step sizing — ``eta = 1.5 max(0, -m) / |g|^2`` targets the
    zero-margin level set directly — makes 8-12 iterations match 30+
    fixed-decay iterations (IoU ~0.97 vs the exact scipy hull oracle on
    real YCB scenes, FPR < 0.005).

    Every point competes against ALL other points each iteration: even
    strictly *farther* points participate in covering hull facets (a chord
    between a closer point and a farther point on opposite sides can pass
    below p), so depth-based *candidate* (column) pruning is unsound.
    Restricting which ROWS get tested is different and exact: a row's
    margin never depends on other rows' margins, so ``num_test_rows=K``
    returns, for the first K points, exactly the visibility of the full
    computation — the remaining points are reported not-visible without
    being tested (used by the synthesis pipeline, which never selects
    occluder points in practice; see synth/pipeline.py).

    On TPU the iteration loop runs as a fused Pallas kernel
    (ops.hpr_pallas) keeping the cloud in VMEM; elsewhere (and under
    ``use_pallas=False``) an equivalent chunked-jnp path runs.

    Args:
      points: (N, 3); padded internally to the chunk boundary.
      param: flip exponent.
      mask: optional (N,) bool validity mask — padded/invalid points are
        never visible and never occlude.
      iters: ascent iterations (quality knob; 12 ~ 0.977 IoU, 8 ~ 0.972).
      slack: acceptance tolerance in meters of flipped radius.
      use_pallas: None = auto (TPU yes, others no).
      num_test_rows: only the first ``num_test_rows`` points are tested
        (exact for those rows — columns stay full); the rest are False.
    Returns:
      (N,) bool visibility.
    """
    n_in = points.shape[0]
    if n_in % row_chunk != 0:
        # pad to the chunk boundary; padded points are masked out everywhere
        pad = row_chunk - n_in % row_chunk
        points = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)])
        base = jnp.ones((n_in,), bool) if mask is None else mask
        mask = jnp.concatenate([base, jnp.zeros((pad,), bool)])
    n = points.shape[0]
    if num_test_rows is None:
        k_pad = n
    else:
        k_pad = min(_round_up(min(num_test_rows, n_in), row_chunk), n)
    _, s, dirs, norms = spherical_flip(points, param, mask)
    valid = (norms > 0) if mask is None else (mask & (norms > 0))

    two_r = jnp.max(jnp.where(valid, norms, 0.0)) * (2.0 * 10.0 ** param)
    s_hat = s / two_r  # normalized flipped radius ~ 1
    # Flipped cloud, normalized; invalid points collapse to the origin so
    # they can never dominate (support 0 < any real support ~ 1).
    f = jnp.where(valid[:, None], s_hat[:, None] * dirs, 0.0)

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    def finish(best):
        vis = (best >= -slack / two_r) & valid[:k_pad]
        if num_test_rows is not None and num_test_rows < k_pad:
            # k_pad rounds up to the chunk boundary; enforce the exact
            # contract (rows >= num_test_rows are never visible)
            vis = vis & (jnp.arange(k_pad) < num_test_rows)
        if k_pad < n:
            vis = jnp.concatenate([vis, jnp.zeros((n - k_pad,), bool)])
        return vis[:n_in]

    if use_pallas:
        from cloudaae_tpu.ops.hpr_pallas import hpr_best_margin_pallas

        best = hpr_best_margin_pallas(
            f[None], dirs[None], iters=iters, chunk=row_chunk,
            num_rows=k_pad,
        )[0]
        return finish(best)

    eps = jnp.asarray(1e-20, points.dtype)
    f_t = f.T  # (3, N)

    def one_chunk(args):
        f_c, d0_c = args

        def body(_, state):
            d_c, best_c = state
            # max over ALL columns including self: a self-argmax means
            # margin 0 = visible with a frozen trajectory — same decision
            # as self-exclusion for any slack >= 0 (see ops.hpr_pallas)
            supp = jnp.matmul(d_c, f_t, precision=lax.Precision.HIGHEST)
            qstar = jnp.argmax(supp, axis=-1)
            margin = jnp.sum(d_c * f_c, axis=-1) - jnp.max(supp, axis=-1)
            best_c = jnp.maximum(best_c, margin)
            g = f_c - f[qstar]
            gn = jnp.sum(g * g, axis=-1) + eps
            eta = 1.5 * jnp.maximum(-margin, 0.0) / gn + 1e-3
            d_new = d_c + eta[:, None] * g
            d_new = d_new / jnp.maximum(
                jnp.linalg.norm(d_new, axis=-1, keepdims=True), eps
            )
            return d_new, best_c

        best0 = jnp.full((row_chunk,), -jnp.inf, points.dtype)
        _, best = lax.fori_loop(0, iters, body, (d0_c, best0))
        return best

    n_chunks = k_pad // row_chunk
    best = lax.map(
        one_chunk,
        (
            f[:k_pad].reshape(n_chunks, row_chunk, 3),
            dirs[:k_pad].reshape(n_chunks, row_chunk, 3),
        ),
    ).reshape(k_pad)
    return finish(best)


def select_visible(
    visible: jnp.ndarray,
    points: jnp.ndarray,
    num_out: int,
    key: jax.Array,
):
    """Fixed-size visible-point selection with the reference's semantics.

    Reproduces ``convexHull``'s output contract
    (utils/hidden_point_removal.py:38-41): visible points in ascending
    original-index order first, then random choices (with replacement) among
    the visible set to reach ``num_out``.

    Returns:
      (selected (num_out, 3), num_visible scalar int32).
    """
    n = visible.shape[0]
    num_vis = jnp.sum(visible).astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    # Stable partition: visible indices (ascending) first.
    order = jnp.argsort(jnp.where(visible, iota, iota + n)).astype(jnp.int32)
    pos = jnp.arange(num_out, dtype=jnp.int32)
    denom = jnp.maximum(num_vis, 1)
    fill = (jax.random.uniform(key, (num_out,)) * denom).astype(jnp.int32)
    fill = jnp.minimum(fill, denom - 1)
    take = jnp.where(pos < num_vis, jnp.minimum(pos, n - 1), fill)
    idx = order[take]
    return points[idx], num_vis


def hidden_point_removal(
    points: jnp.ndarray,
    num_out: int,
    key: jax.Array,
    param: float,
    mask: jnp.ndarray | None = None,
    iters: int = DEFAULT_ITERS,
    slack: float = 2e-4,
    row_chunk: int = _ROW_CHUNK,
    num_test_rows: int | None = None,
):
    """Flip -> visibility -> fixed-size resample, as one fused device op.

    Equivalent to the reference chain ``sphericalFlip`` +
    ``hidden_point_removal`` (utils/hidden_point_removal.py:6-48) but pure and
    jittable.  Batch via ``jax.vmap``.  ``num_test_rows`` restricts the
    selectable population to the first K points (see
    :func:`hpr_visible_mask`); points past K still occlude.

    Returns:
      (selected (num_out, 3), num_visible, visible_mask (N,)).
    """
    visible = hpr_visible_mask(
        points, param, mask, iters, slack, row_chunk,
        num_test_rows=num_test_rows,
    )
    if num_test_rows is not None:
        # nothing past num_test_rows is visible — shrink the selection
        # argsort to the tested prefix (same selected set, same order)
        k = min(num_test_rows, points.shape[0])
        selected, num_vis = select_visible(visible[:k], points[:k], num_out, key)
    else:
        selected, num_vis = select_visible(visible, points, num_out, key)
    return selected, num_vis, visible
