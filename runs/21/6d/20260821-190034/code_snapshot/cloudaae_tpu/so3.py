"""SO(3) math: exponential/log maps, geodesic error, quaternion conversions.

Capability parity with the reference's ``losses/angular_distance_taylor.py``
(skew_symmetric :6, exponential_map :30, logarithm :69, get_rotation_error
:103) and the quat->axis-angle py_func in ``evaluate_cloudAAE_ycbv.py:66-79``
— but written dtype-polymorphic and branch-safe for XLA: both sides of every
``where`` are finite (no 0/0 in the untaken branch), so gradients are clean
under jit on TPU in float32.  The reference runs this in float64 on GPU; on
TPU f64 is emulated and slow, so the default is f32 with the same Taylor
guards.  Tests cross-check f32-TPU-style results against f64 on CPU.

All functions accept arbitrary leading batch dimensions: vectors are
``(..., 3)``, matrices ``(..., 3, 3)``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

# 3x3 products feed arccos/trace tests with ~1e-7-scale margins; the default
# matmul precision (bf16-class on TPU and some CPU backends) corrupts them.
_mm = functools.partial(jnp.matmul, precision="highest")

# Taylor-branch switch points, matching the reference:
#   exponential_map uses  theta^2 < 1e-2   (angular_distance_taylor.py:30,43)
#   logarithm       uses  theta   < 1e-2   (angular_distance_taylor.py:69,85)
EXP_EPS_THETA_SQ = 1e-2
LOG_EPS_THETA = 1e-2
# acos clamp used by the reference's logarithm (angular_distance_taylor.py:81).
ACOS_CLAMP = 0.9999999


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix [v]_x."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def unskew(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`skew`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack(
        [m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1
    )


def exp_map(axag: jnp.ndarray, eps: float = EXP_EPS_THETA_SQ) -> jnp.ndarray:
    """Rodrigues' formula: axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    ``exp([w]_x) = I + (sin t / t) [w]_x + ((1 - cos t)/t^2) [w]_x^2`` with
    8th-order Taylor fallbacks for ``t^2 < eps`` (same series and switch point
    as the reference, angular_distance_taylor.py:50-56).
    """
    dtype = axag.dtype
    ss = skew(axag)
    t2 = jnp.sum(jnp.square(axag), axis=-1)
    small = t2 < eps

    # Guard the exact branch against 0/0 at t == 0 (the where still evaluates
    # both sides under XLA).
    t2_safe = jnp.where(small, jnp.ones_like(t2), t2)
    t = jnp.sqrt(t2_safe)
    t4 = t2 * t2
    t6 = t4 * t2
    t8 = t4 * t4

    term1 = jnp.where(
        small,
        1 - t2 / 6 + t4 / 120 - t6 / 5040 + t8 / 362880,
        jnp.sin(t) / t,
    )
    term2 = jnp.where(
        small,
        0.5 - t2 / 24 + t4 / 720 - t6 / 40320 + t8 / 3628800,
        (1 - jnp.cos(t)) / t2_safe,
    )

    eye = jnp.eye(3, dtype=dtype)
    eye = jnp.broadcast_to(eye, ss.shape)
    return (
        eye
        + term1[..., None, None] * ss
        + term2[..., None, None] * _mm(ss, ss)
    )


def log_map(R: jnp.ndarray, eps: float = LOG_EPS_THETA) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Matrix log: (..., 3, 3) -> (axis-angle (..., 3), angle (...)).

    ``theta = arccos(clip((tr R - 1)/2))``; the axis-angle vector is
    ``theta/(2 sin theta) * unskew(R - R^T)`` with the reference's Taylor
    fallback ``0.5 + t^2/12 + 7 t^4/720 + 31 t^6/30240`` for ``theta < eps``
    (angular_distance_taylor.py:85-94) and the same +/-0.9999999 acos clamp.

    Note: near theta = pi the (R - R^T) formulation degenerates — same
    limitation as the reference; the geodesic *angle* returned is always valid.
    """
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    c = jnp.clip((trace - 1) / 2, -ACOS_CLAMP, ACOS_CLAMP)
    theta = jnp.arccos(c)

    small = theta < eps
    t2 = theta * theta
    t4 = t2 * t2
    t6 = t2 * t4
    sin_safe = jnp.where(small, jnp.ones_like(theta), jnp.sin(theta))
    factor = jnp.where(
        small,
        0.5 + t2 / 12 + 7 * t4 / 720 + 31 * t6 / 30240,
        theta / (2 * sin_safe),
    )
    axag = factor[..., None] * unskew(R - jnp.swapaxes(R, -1, -2))
    return axag, theta


def geodesic_angle(R_a: jnp.ndarray, R_b: jnp.ndarray) -> jnp.ndarray:
    """Angle of R_a @ R_b^T — the geodesic distance on SO(3), (...,)."""
    _, theta = log_map(_mm(R_a, jnp.swapaxes(R_b, -1, -2)))
    return theta


def rotation_error(pred_axag: jnp.ndarray, label_axag: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Geodesic rotation error between two axis-angle batches.

    Mirrors ``get_rotation_error`` (angular_distance_taylor.py:103-116):
    returns ``(mean_angle, per_sample_angle)`` in radians.
    """
    return rotation_error_mat(exp_map(pred_axag), label_axag)


def rotation_error_mat(R_pred: jnp.ndarray, label_axag: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`rotation_error` with the prediction already a matrix.

    Shared by both rotation-head representations (``head_to_mat``): the
    loss/metric is the geodesic angle either way.
    """
    theta = geodesic_angle(exp_map(label_axag), R_pred)
    return jnp.mean(theta), theta


def rot6d_to_mat(x: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D rotation representation -> matrix (..., 6) -> (..., 3, 3).

    Gram-Schmidt on the two predicted 3-vectors (the first two *columns* of
    R), per "On the Continuity of Rotation Representations in Neural
    Networks" (Zhou et al., CVPR 2019).  Unlike axis-angle — the reference's
    head output (models/pointnet_ycb_23_decoder_4.py:443-449), which is
    discontinuous at ||v|| = pi — this map is continuous and surjective onto
    SO(3), which is what lets a regression head cover the full rotation
    group (ModelConfig.rot_rep = '6d').
    """
    a1, a2 = x[..., 0:3], x[..., 3:6]
    eps = jnp.asarray(1e-8, x.dtype)
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), eps)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)  # columns


def mat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Matrix -> 6D representation: the first two columns, flattened (..., 6)."""
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def head_to_mat(rot: jnp.ndarray, rep: str) -> jnp.ndarray:
    """Rotation-head output -> matrix for either head representation.

    ``rep='axag'``: (..., 3) axis-angle through :func:`exp_map` (the
    reference's convention); ``rep='6d'``: (..., 6) through
    :func:`rot6d_to_mat`.
    """
    if rep == "axag":
        return exp_map(rot)
    if rep == "6d":
        return rot6d_to_mat(rot)
    raise ValueError(f"unknown rotation representation {rep!r}")


def split_hypotheses(
    rot: jnp.ndarray, rep_dim: int, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-hypothesis rot-head output -> (hypotheses, confidence logits).

    The head emits ``(..., k * (rep_dim + 1))``: k representation blocks
    (axis-angle or 6d, ModelConfig.rot_rep) followed by k confidence
    logits.  Returns ``((..., k, rep_dim), (..., k))``.  For k = 1 the
    head emits plain ``(..., rep_dim)`` (the reference layout,
    models/pointnet_ycb_23_decoder_4.py:443-449) and the confidence is a
    zero logit.
    """
    if k == 1:
        hyps = rot[..., None, :]
        return hyps, jnp.zeros(rot.shape[:-1] + (1,), rot.dtype)
    hyps = rot[..., : k * rep_dim].reshape(*rot.shape[:-1], k, rep_dim)
    conf = rot[..., k * rep_dim :]
    return hyps, conf


def translation_error(pred: jnp.ndarray, label: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Euclidean translation error; mirrors ``losses/trans_distance.py:4-9``.

    Returns ``(mean, per_sample)`` in the input's units (meters).
    """
    per_sample = jnp.linalg.norm(pred - label, axis=-1)
    return jnp.mean(per_sample), per_sample


def quat_to_axag(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) (..., 4) -> axis-angle (..., 3).

    Replaces the ``transforms3d.quaternions.quat2axangle`` host py_func
    (evaluate_cloudAAE_ycbv.py:66-79) with a closed-form on-device version.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w = q[..., 0]
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    small = vnorm < 1e-8
    vnorm_safe = jnp.where(small, jnp.ones_like(vnorm), vnorm)
    angle = 2.0 * jnp.arctan2(vnorm, w)
    # wrap to (-pi, pi] so the axis-angle norm is the geodesic angle
    angle = jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)
    axis = v / vnorm_safe[..., None]
    return jnp.where(small[..., None], jnp.zeros_like(v), axis * angle[..., None])


def axag_to_quat(axag: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> unit quaternion (w, x, y, z) (..., 4)."""
    theta = jnp.linalg.norm(axag, axis=-1)
    small = theta < 1e-8
    theta_safe = jnp.where(small, jnp.ones_like(theta), theta)
    axis = axag / theta_safe[..., None]
    half = theta / 2
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)[..., None]
    xyz = jnp.where(small[..., None], axag / 2, xyz)
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) (..., 4) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def twist_angle(R: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """Twist of a rotation about a given unit axis (swing-twist split).

    For q = (w, v): twist about a = 2 atan2(<v, a>, w) — the angle of the
    component of R that rotates about ``axis``.

    Args:
      R: (..., 3, 3); axis: (..., 3) or (3,) unit vector.
    Returns:
      (...,) twist angle in (-pi, pi].
    """
    axag, _ = log_map(R)
    q = axag_to_quat(axag)
    w = q[..., 0]
    proj = jnp.sum(q[..., 1:] * axis, axis=-1)
    return 2.0 * jnp.arctan2(proj, w)


def rotation_decomp(R: jnp.ndarray, axes: jnp.ndarray) -> jnp.ndarray:
    """Per-axis twist decomposition of a rotation batch.

    Capability parity with the ``rotation_decomp`` diagnostic used by the
    shipped-checkpoint training script
    (trained_network/.../train_6d_...compact.py:329-350): decompose each
    rotation into its twist about each of the given (symmetry) axes, e.g.
    to report decomp_loss_x/y/z summaries.

    Args:
      R: (B, 3, 3); axes: (K, 3) unit axes.
    Returns:
      (B, K) twist angles.
    """
    import jax

    return jax.vmap(
        lambda a: twist_angle(R, a), out_axes=-1
    )(axes)


def transform_points(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform: (..., N, 3) @ R^T + t.

    Matches ``transform_object_model`` (train_cloudAAE_ycbv.py:88-93).
    """
    return _mm(points, jnp.swapaxes(R, -1, -2)) + t[..., None, :]
