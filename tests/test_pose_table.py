"""Pin the generated-pose sampler to the dataset's camera (VERDICT r2 #7).

``train.generate_pose_table`` must draw translations from the frustum of
the dataset being trained (``cfg.synth.camera`` — YCBV vs LINEMOD camera
constants, utils/generate_occluder.py:40-51 /
utils/sample_pose_in_frustum.py:127-137), so that ``--generate-poses``
training and the uniform-pose eval sources share one distribution.
"""

import numpy as np

from cloudaae_tpu.config import (
    Config,
    LINEMOD_CAMERA,
    ModelConfig,
    SynthConfig,
    YCBV_CAMERA,
)
from cloudaae_tpu.train import generate_pose_table


def _cfg(dataset: str, num_class: int) -> Config:
    return Config(
        synth=SynthConfig(dataset=dataset),
        model=ModelConfig(num_class=num_class),
    )


def test_camera_property_dispatches_on_dataset():
    assert _cfg("ycbv", 21).synth.camera is YCBV_CAMERA
    assert _cfg("linemod", 13).synth.camera is LINEMOD_CAMERA
    assert YCBV_CAMERA.near != LINEMOD_CAMERA.near
    assert YCBV_CAMERA.far != LINEMOD_CAMERA.far


def test_pose_table_translations_match_dataset_frustum():
    n = 4096
    for dataset, num_class, cam in (
        ("ycbv", 21, YCBV_CAMERA),
        ("linemod", 13, LINEMOD_CAMERA),
    ):
        table = generate_pose_table(_cfg(dataset, num_class), n, seed=3)
        z = table["translation"][:, 2]
        mid = (cam.far + cam.near) / 2.0
        sigma = (cam.far - cam.near) / 7.0
        # z ~ N(mid, sigma) with out-of-image snaps to exactly `mid`
        # (synth/frustum.py sample_translation) -> the sample mean must sit
        # on the dataset's frustum middle, far from the other dataset's.
        assert abs(float(z.mean()) - mid) < 4 * sigma / np.sqrt(n) + 0.01, (
            dataset, float(z.mean()), mid)
        other_mid = (LINEMOD_CAMERA.far + LINEMOD_CAMERA.near) / 2.0 \
            if dataset == "ycbv" else (YCBV_CAMERA.far + YCBV_CAMERA.near) / 2.0
        assert abs(float(z.mean()) - mid) < abs(float(z.mean()) - other_mid)
        # class ids span the dataset's class count
        assert table["class_id"].min() >= 0
        assert table["class_id"].max() == num_class - 1


def test_eval_uniform_source_shares_training_sampler():
    """scripts/eval_trained.py --pose-source uniform must draw from the
    SAME frustum sampler as --generate-poses training (VERDICT r3 #6) —
    not an ad-hoc N(0,0.04)^2 x U(0.6,0.9) translation draw."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "eval_trained.py",
    )
    spec = importlib.util.spec_from_file_location("eval_trained", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    for cam in (YCBV_CAMERA, LINEMOD_CAMERA):
        R, t = mod.uniform_eval_poses(cam, cls=3, frames=256)
        # rotations are valid and span SO(3) (angle range near pi)
        assert np.allclose(
            np.einsum("bij,bkj->bik", R, R), np.eye(3)[None], atol=1e-5
        )
        from scipy.spatial.transform import Rotation

        angles = np.linalg.norm(Rotation.from_matrix(R).as_rotvec(), axis=1)
        assert angles.max() > 0.9 * np.pi
        # translations sit in THIS dataset's frustum (z mean at the
        # frustum middle, the signature of synth.sample_translation)
        mid = (cam.far + cam.near) / 2.0
        sigma = (cam.far - cam.near) / 7.0
        assert abs(float(t[:, 2].mean()) - mid) < sigma
        # and NOT in the ad-hoc U(0.6, 0.9) band unless the frustum is
        # there: LINEMOD's middle (~0.85) differs from YCBV's (~0.75)
        assert t[:, 2].std() > 0.01  # not a constant


def test_pose_table_rotations_cover_so3():
    """Generated rotations must span the full angle range (the capability
    the record-pose prior cannot express, train_cloudAAE_ycbv.py:177)."""
    table = generate_pose_table(_cfg("ycbv", 21), 2048, seed=11)
    angles = np.linalg.norm(table["axisangle"], axis=1)
    assert angles.max() > 0.95 * np.pi
    # uniform angle in [-pi, pi) -> |angle| uniform on [0, pi):
    # mean ~ pi/2, both halves populated
    assert abs(angles.mean() - np.pi / 2) < 0.1
    assert (angles < np.pi / 2).mean() > 0.4
    assert (angles > np.pi / 2).mean() > 0.4
