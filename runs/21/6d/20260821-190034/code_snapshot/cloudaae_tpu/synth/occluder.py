"""Occluder generation on device.

Equivalent of ``utils/generate_occluder.py``: spherical Gaussian blobs
(:38-81, the variant the YCB training pipeline uses,
train_cloudAAE_ycbv.py:102) and posed-object occluders (:5-35).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cloudaae_tpu.config import CameraConfig, SynthConfig
from cloudaae_tpu.synth.frustum import frustum_dims, sample_rotation


def _blob_centers(
    key: jax.Array,
    num: int,
    object_z: jnp.ndarray,
    cam: CameraConfig,
    spread_div: float,
) -> jnp.ndarray:
    """Occluder centers between the camera and the object.

    x ~ N(0, Wnear/div), y ~ N(0, Hnear/div),
    z ~ N((near + obj_z)/2, (obj_z - near)/6)
    (utils/generate_occluder.py:24-26,60-62).
    """
    h_near, w_near, _, _ = frustum_dims(cam)
    kx, ky, kz = jax.random.split(key, 3)
    x = jax.random.normal(kx, (num,)) * (w_near / spread_div)
    y = jax.random.normal(ky, (num,)) * (h_near / spread_div)
    z = (cam.near + object_z) / 2.0 + jax.random.normal(kz, (num,)) * (
        (object_z - cam.near) / 6.0
    )
    return jnp.stack([x, y, z], axis=-1)


def spherical_occluder(
    key: jax.Array,
    object_z: jnp.ndarray,
    cfg: SynthConfig,
) -> jnp.ndarray:
    """Gaussian blob occluders: (num_blobs * points_per_blob, 3).

    Mirrors ``get_random_spherical_occluder`` (utils/generate_occluder.py:38-81):
    2 blobs x 200 points, per-point sigma 1cm, centers spread Wnear/10.
    """
    kc, kp = jax.random.split(key)
    centers = _blob_centers(kc, cfg.num_occluder_blobs, object_z, cfg.camera, 10.0)
    noise = (
        jax.random.normal(kp, (cfg.num_occluder_blobs, cfg.points_per_blob, 3))
        * cfg.occluder_sigma
    )
    pts = centers[:, None, :] + noise
    return pts.reshape(-1, 3)


def object_occluder(
    key: jax.Array,
    object_z: jnp.ndarray,
    obj_models: jnp.ndarray,
    cfg: SynthConfig,
) -> jnp.ndarray:
    """A random object model posed as an occluder: (object_occluder_points, 3).

    Mirrors ``get_random_object_occluder`` (utils/generate_occluder.py:5-35):
    a random class's first 512 model points, randomly rotated, placed with
    centers spread Wnear/8.
    """
    kc, kr, kp = jax.random.split(key, 3)
    cls = jax.random.randint(kc, (), 0, obj_models.shape[0])
    pts = jax.lax.dynamic_index_in_dim(obj_models, cls, keepdims=False)
    pts = pts[: cfg.object_occluder_points, :3]
    _, rot = sample_rotation(kr)
    center = _blob_centers(kp, 1, object_z, cfg.camera, 8.0)[0]
    return pts @ rot.T + center
