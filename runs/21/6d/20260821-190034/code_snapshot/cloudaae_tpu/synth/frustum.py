"""Camera-frustum geometry and 6D pose sampling, on device.

Equivalent of ``utils/sample_pose_in_frustum.py``: uniform rotation sampling
on S^2 x uniform angle (:8-27), frustum dimensions from fov/near/far (:42-70),
Gaussian in-frustum translation snapped to the frustum middle when its image
reprojection leaves the frame (:73-153).  All functions take explicit PRNG
keys and work under jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cloudaae_tpu import so3
from cloudaae_tpu.config import CameraConfig, LINEMOD_CAMERA


def frustum_dims(cam: CameraConfig):
    """(Hnear, Wnear, Hfar, Wfar) — ``get_frustum``
    (utils/sample_pose_in_frustum.py:42-49).  Static python floats."""
    h_near = 2.0 * cam.half_fov_tan * cam.near
    h_far = 2.0 * cam.half_fov_tan * cam.far
    return (
        h_near,
        h_near * cam.aspect_ratio,
        h_far,
        h_far * cam.aspect_ratio,
    )


def frustum_corners(cam: CameraConfig) -> jnp.ndarray:
    """The 8 frustum corner points (8, 3), for visualization/debugging.

    Mirrors the corner construction of ``get_frustum``
    (utils/sample_pose_in_frustum.py:51-68) with camera at the origin
    looking along +z, up = +y.
    """
    h_near, w_near, h_far, w_far = frustum_dims(cam)
    up = jnp.array([0.0, 1.0, 0.0])
    right = jnp.cross(up, jnp.array([0.0, 0.0, 1.0]))
    corners = []
    for dist, h, w in ((cam.far, h_far, w_far), (cam.near, h_near, w_near)):
        c = jnp.array([0.0, 0.0, dist])
        for su in (1.0, -1.0):
            for sr in (-1.0, 1.0):
                corners.append(c + su * up * h / 2 + sr * right * w / 2)
    return jnp.stack(corners)


def sample_rotation(key: jax.Array) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform axis on S^2, uniform angle in [-pi, pi).

    Mirrors ``sample_rot`` (utils/sample_pose_in_frustum.py:8-27) — note this
    is *not* Haar-uniform on SO(3), by design of the reference.

    Returns (axag (3,), R (3, 3)).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(k1, (), minval=0.0, maxval=2 * jnp.pi)
    u = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
    s = jnp.sqrt(1 - u * u)
    axis = jnp.stack([s * jnp.cos(theta), s * jnp.sin(theta), u])
    angle = jax.random.uniform(k3, (), minval=-jnp.pi, maxval=jnp.pi)
    axag = axis * angle
    return axag, so3.exp_map(axag)


def sample_translation(key: jax.Array, cam: CameraConfig = LINEMOD_CAMERA) -> jnp.ndarray:
    """Gaussian translation inside the frustum, reprojection-checked.

    Mirrors ``translation_generation`` (utils/sample_pose_in_frustum.py:73-153):
    x, y ~ N(0, (Wnear+Wfar)/7), z ~ N((far+near)/2, (far-near)/7); if the
    point projects outside the image it snaps to the frustum middle.
    """
    h_near, w_near, h_far, w_far = frustum_dims(cam)
    kx, ky, kz = jax.random.split(key, 3)
    sigma_xy = (w_near + w_far) / 7.0
    x = jax.random.normal(kx, ()) * sigma_xy
    y = jax.random.normal(ky, ()) * sigma_xy
    z = (cam.far + cam.near) / 2.0 + jax.random.normal(kz, ()) * (
        (cam.far - cam.near) / 7.0
    )
    t = jnp.stack([x, y, z])

    # pinhole reprojection check (get_final_translation :119-124)
    z_safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    u = cam.fx * x / z_safe + cam.cx
    v = cam.fy * y / z_safe + cam.cy
    inside = (
        (u > 0.0) & (u < cam.image_width) & (v > 0.0) & (v < cam.image_height)
    )
    middle = jnp.array([0.0, 0.0, (cam.far + cam.near) / 2.0])
    return jnp.where(inside, t, middle)


def sample_pose(key: jax.Array, cam: CameraConfig = LINEMOD_CAMERA):
    """Sample a full 6D pose: (axag (3,), R (3,3), t (3,))."""
    kr, kt = jax.random.split(key)
    axag, rot = sample_rotation(kr)
    t = sample_translation(kt, cam)
    return axag, rot, t
