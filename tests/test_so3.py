"""SO(3) toolkit tests: round-trips, Taylor-branch continuity, oracles.

Fixture strategy from SURVEY.md §4(b): exp/log round-trip identities,
geodesic(R, R) = 0, and continuity across the Taylor switch points
(theta^2 = 1e-2 for exp, theta = 1e-2 for log), cross-checked against a
float64 numpy Rodrigues oracle (the reference runs the same math in float64
TF, losses/angular_distance_taylor.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cloudaae_tpu import so3


def np_rodrigues(axag):
    """float64 numpy oracle for the exponential map."""
    axag = np.asarray(axag, np.float64)
    theta = np.linalg.norm(axag, axis=-1, keepdims=True)
    out = np.zeros(axag.shape[:-1] + (3, 3))
    for i in np.ndindex(axag.shape[:-1]):
        t = theta[i][0]
        if t < 1e-12:
            out[i] = np.eye(3)
            continue
        k = axag[i] / t
        kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        out[i] = np.eye(3) + np.sin(t) * kx + (1 - np.cos(t)) * (kx @ kx)
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_skew_unskew_roundtrip(rng):
    v = rng.normal(size=(7, 3)).astype(np.float32)
    s = so3.skew(jnp.asarray(v))
    assert np.allclose(np.asarray(s), -np.swapaxes(np.asarray(s), -1, -2))
    assert np.allclose(np.asarray(so3.unskew(s)), v)


def test_exp_map_matches_numpy_oracle(rng):
    axag = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(so3.exp_map(jnp.asarray(axag)))
    want = np_rodrigues(axag)
    assert np.max(np.abs(got - want)) < 1e-5


def test_exp_map_small_angles_taylor_branch(rng):
    # angles straddling theta^2 = 1e-2 (theta = 0.1)
    thetas = np.array([0.0, 1e-6, 1e-3, 0.09, 0.0999, 0.1001, 0.11, 0.2])
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    axag = (thetas[:, None] * axis).astype(np.float32)
    got = np.asarray(so3.exp_map(jnp.asarray(axag)))
    want = np_rodrigues(axag)
    assert np.max(np.abs(got - want)) < 1e-6


def test_exp_log_roundtrip(rng):
    # stay away from theta = pi where log is degenerate (same as reference)
    axag = rng.normal(size=(128, 3)).astype(np.float32)
    norms = np.linalg.norm(axag, axis=-1, keepdims=True)
    axag = axag / norms * np.minimum(norms, 2.8)
    R = so3.exp_map(jnp.asarray(axag))
    back, theta = so3.log_map(R)
    assert np.allclose(np.asarray(back), axag, atol=2e-3)
    assert np.allclose(np.asarray(theta), np.linalg.norm(axag, axis=-1), atol=1e-3)


def test_log_map_small_angle_branch():
    thetas = np.array([0.0, 1e-5, 5e-3, 0.0099, 0.0101, 0.02])
    axis = np.array([0.0, 0.0, 1.0])
    axag = (thetas[:, None] * axis).astype(np.float32)
    R = so3.exp_map(jnp.asarray(axag))
    back, theta_out = so3.log_map(R)
    assert np.allclose(np.asarray(back), axag, atol=1e-5)


def test_rotation_error_zero_for_identical(rng):
    axag = rng.normal(size=(16, 3)).astype(np.float32) * 0.5
    mean, per = so3.rotation_error(jnp.asarray(axag), jnp.asarray(axag))
    # acos clamp at 0.9999999 floors the self-distance at ~4.5e-4 rad,
    # identical to the reference (angular_distance_taylor.py:81)
    assert float(mean) < 1e-3
    assert per.shape == (16,)


def test_rotation_error_known_angle():
    # rotate about z by 0.7 rad vs identity -> geodesic distance 0.7
    a = np.array([[0.0, 0.0, 0.7]], np.float32)
    b = np.zeros((1, 3), np.float32)
    mean, _ = so3.rotation_error(jnp.asarray(a), jnp.asarray(b))
    assert abs(float(mean) - 0.7) < 1e-5


def test_translation_error():
    pred = jnp.asarray([[1.0, 2.0, 2.0]])
    label = jnp.zeros((1, 3))
    mean, per = so3.translation_error(pred, label)
    assert abs(float(mean) - 3.0) < 1e-6


def test_quat_axag_roundtrip(rng):
    axag = rng.normal(size=(64, 3)).astype(np.float32)
    norms = np.linalg.norm(axag, axis=-1, keepdims=True)
    axag = axag / norms * np.minimum(norms, 3.0)
    q = so3.axag_to_quat(jnp.asarray(axag))
    back = so3.quat_to_axag(q)
    assert np.allclose(np.asarray(back), axag, atol=1e-5)


def test_quat_to_mat_consistent_with_exp_map(rng):
    axag = rng.normal(size=(32, 3)).astype(np.float32)
    R1 = so3.exp_map(jnp.asarray(axag))
    R2 = so3.quat_to_mat(so3.axag_to_quat(jnp.asarray(axag)))
    assert np.max(np.abs(np.asarray(R1) - np.asarray(R2))) < 1e-5


def test_quat_to_axag_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    q_xyzw = Rotation.random(50, rng).as_quat()  # scipy: (x, y, z, w)
    q_wxyz = np.roll(q_xyzw, 1, axis=-1).astype(np.float32)
    got = np.asarray(so3.quat_to_axag(jnp.asarray(q_wxyz)))
    want = Rotation.from_quat(q_xyzw).as_rotvec()
    assert np.max(np.abs(got - want)) < 1e-4


def test_transform_points(rng):
    pts = rng.normal(size=(4, 100, 3)).astype(np.float32)
    axag = rng.normal(size=(4, 3)).astype(np.float32)
    t = rng.normal(size=(4, 3)).astype(np.float32)
    R = so3.exp_map(jnp.asarray(axag))
    out = so3.transform_points(jnp.asarray(pts), R, jnp.asarray(t))
    want = np.einsum("bij,bnj->bni", np.asarray(R), pts) + t[:, None]
    assert np.max(np.abs(np.asarray(out) - want)) < 1e-5


def test_f32_matches_f64_jax(rng):
    """SURVEY §7 hard-part #4: the reference runs rotation math in float64;
    validate that our f32-with-Taylor-branches matches a true-f64 jax run
    to well under the loss's meaningful scale."""
    import jax

    axag = rng.normal(size=(256, 3)).astype(np.float64)
    norms = np.linalg.norm(axag, axis=-1, keepdims=True)
    axag = axag / norms * np.minimum(norms, 3.1)
    pred = axag + rng.normal(size=axag.shape) * 0.05

    mean32, per32 = so3.rotation_error(
        jnp.asarray(axag, jnp.float32), jnp.asarray(pred, jnp.float32)
    )
    with jax.enable_x64():
        mean64, per64 = so3.rotation_error(
            jnp.asarray(axag, jnp.float64), jnp.asarray(pred, jnp.float64)
        )
    # acos clamp floors tiny angles at ~4.5e-4 rad in both dtypes;
    # everything here is ~0.05 rad so direct comparison is meaningful
    assert abs(float(mean32) - float(mean64)) < 5e-4
    assert np.max(np.abs(np.asarray(per32) - np.asarray(per64))) < 5e-3


def test_exp_map_f64_support(rng):
    import jax

    axag = rng.normal(size=(16, 3))
    with jax.enable_x64():
        R = so3.exp_map(jnp.asarray(axag, jnp.float64))
        assert R.dtype == jnp.float64
        eye = np.einsum("bij,bkj->bik", np.asarray(R), np.asarray(R))
        assert np.max(np.abs(eye - np.eye(3))) < 1e-12


def test_rotation_decomp_twist(rng):
    """Twist about the rotation's own axis = the angle; about orthogonal
    axes = 0 (parity with the snapshot script's rotation_decomp diagnostic)."""
    axes = np.eye(3, dtype=np.float32)
    # rotation purely about z by 0.6 rad
    R = so3.exp_map(jnp.asarray([[0.0, 0.0, 0.6]], jnp.float32))
    dec = np.asarray(so3.rotation_decomp(R, jnp.asarray(axes)))
    assert dec.shape == (1, 3)
    assert abs(dec[0, 2] - 0.6) < 1e-4
    assert abs(dec[0, 0]) < 1e-4 and abs(dec[0, 1]) < 1e-4

    # generic rotation: twist about its own axis equals its angle
    axag = rng.normal(size=(8, 3)).astype(np.float32)
    n = np.linalg.norm(axag, axis=-1, keepdims=True)
    axag = axag / n * np.minimum(n, 2.5)
    R = so3.exp_map(jnp.asarray(axag))
    own_axis = axag / np.linalg.norm(axag, axis=-1, keepdims=True)
    tw = np.asarray(so3.twist_angle(R, jnp.asarray(own_axis)))
    assert np.allclose(np.abs(tw), np.linalg.norm(axag, axis=-1), atol=2e-3)


def test_rot6d_roundtrip(rng):
    """R -> 6d (first two columns) -> R is the identity on SO(3)."""
    axag = rng.normal(size=(32, 3)).astype(np.float32)
    R = np_rodrigues(axag)
    x6 = so3.mat_to_rot6d(jnp.asarray(R, jnp.float32))
    R_back = np.asarray(so3.rot6d_to_mat(x6))
    assert np.max(np.abs(R_back - R)) < 1e-5


def test_rot6d_arbitrary_input_is_rotation(rng):
    """Any (non-degenerate) 6-vector maps to a proper rotation matrix —
    the surjectivity/validity property the head relies on."""
    x6 = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    R = np.asarray(so3.rot6d_to_mat(x6), np.float64)
    eye = np.einsum("bij,bkj->bik", R, R)
    assert np.max(np.abs(eye - np.eye(3))) < 1e-5
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_rot6d_continuity_near_pi(rng):
    """The 6d rep is continuous where axis-angle is not: two rotations a
    tiny geodesic step apart across theta = pi have nearby 6d coords but
    near-antipodal axis-angle vectors."""
    axis = np.array([0.0, 0.0, 1.0])
    R_a = np_rodrigues((np.pi - 1e-3) * axis[None])
    R_b = np_rodrigues(-(np.pi - 1e-3) * axis[None])  # same point +2e-3 geodesic
    x_a = np.asarray(so3.mat_to_rot6d(jnp.asarray(R_a, jnp.float32)))
    x_b = np.asarray(so3.mat_to_rot6d(jnp.asarray(R_b, jnp.float32)))
    assert np.linalg.norm(x_a - x_b) < 0.01  # continuous in 6d
    # ... while the axag coords are ~2*pi apart
    assert np.linalg.norm((np.pi - 1e-3) * axis - (-(np.pi - 1e-3) * axis)) > 6


def test_head_to_mat_dispatch(rng):
    axag = rng.normal(size=(8, 3)).astype(np.float32)
    R_ref = np.asarray(so3.exp_map(jnp.asarray(axag)))
    assert np.allclose(
        np.asarray(so3.head_to_mat(jnp.asarray(axag), "axag")), R_ref
    )
    x6 = so3.mat_to_rot6d(jnp.asarray(R_ref))
    assert np.allclose(
        np.asarray(so3.head_to_mat(x6, "6d")), R_ref, atol=1e-5
    )
    with pytest.raises(ValueError):
        so3.head_to_mat(jnp.zeros((1, 3)), "euler")


def test_rotation_error_mat_matches_axag_path(rng):
    pred = rng.normal(size=(16, 3)).astype(np.float32)
    label = rng.normal(size=(16, 3)).astype(np.float32)
    mean_a, per_a = so3.rotation_error(jnp.asarray(pred), jnp.asarray(label))
    mean_m, per_m = so3.rotation_error_mat(
        so3.exp_map(jnp.asarray(pred)), jnp.asarray(label)
    )
    assert np.allclose(float(mean_a), float(mean_m), atol=1e-6)
    assert np.allclose(np.asarray(per_a), np.asarray(per_m), atol=1e-6)
