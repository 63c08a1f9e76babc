"""LINEMOD converter tests on a generated fixture tree.

No LINEMOD data ships with the reference mount, so the fixture builds the
exact ``Linemod_preprocessed`` directory layout (pngs + gt.yml/info.yml +
split lists) from rendered synthetic objects, and the converter runs on it
end to end.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from cloudaae_tpu import so3
from cloudaae_tpu.data import linemod

pytest.importorskip("PIL")
pytest.importorskip("yaml")


def test_class_remapping():
    assert [linemod.remap_class(c) for c in linemod.LINEMOD_CLASS_IDS] == list(
        range(13)
    )
    with pytest.raises(ValueError):
        linemod.remap_class(3)
    with pytest.raises(ValueError):
        linemod.remap_class(7)


@pytest.fixture(scope="module")
def linemod_tree(tmp_path_factory):
    """Build a 2-class, 3-frame Linemod_preprocessed fixture."""
    from PIL import Image
    import yaml

    root = tmp_path_factory.mktemp("linemod")
    rng = np.random.default_rng(0)
    fx, fy, cx, cy = 572.4114, 573.57043, 325.2611, 242.04899
    poses = {}

    for cls in (1, 4):  # remap to 0 and 2
        cls_dir = root / "data" / f"{cls:02d}"
        for sub in ("rgb", "depth", "mask"):
            (cls_dir / sub).mkdir(parents=True)
        gt, info = {}, {}
        frames = []
        # object: a ball of points
        d = rng.normal(size=(4096, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        model = d * 0.05

        for frame_id in range(3):
            axag = rng.normal(size=3) * 0.8
            R = np.asarray(so3.exp_map(jnp.asarray(axag, jnp.float32)), np.float64)
            t = np.array([rng.normal(0, 0.02), rng.normal(0, 0.02),
                          rng.uniform(0.6, 0.8)])
            pts = model @ R.T + t
            z = pts[:, 2]
            u = np.round(fx * pts[:, 0] / z + cx).astype(int)
            v = np.round(fy * pts[:, 1] / z + cy).astype(int)
            ok = (u >= 0) & (u < 640) & (v >= 0) & (v < 480)
            depth = np.zeros((480, 640), np.float64)
            order = np.argsort(-z[ok])
            depth[v[ok][order], u[ok][order]] = z[ok][order] * 1000.0  # mm
            mask = (depth > 0).astype(np.uint8) * 255
            rgb = np.zeros((480, 640, 3), np.uint8)
            rgb[depth > 0] = 128

            name = f"{frame_id:04d}"
            Image.fromarray(rgb).save(cls_dir / "rgb" / f"{name}.png")
            Image.fromarray(depth.astype(np.uint16)).save(
                cls_dir / "depth" / f"{name}.png"
            )
            Image.fromarray(mask).save(cls_dir / "mask" / f"{name}.png")
            frames.append(name)

            gt[frame_id] = [
                {
                    "obj_id": cls,
                    "cam_t_m2c": (t * 1000.0).tolist(),
                    "cam_R_m2c": R.reshape(-1).tolist(),
                }
            ]
            info[frame_id] = {
                "cam_K": [fx, 0.0, cx, 0.0, fy, cy, 0.0, 0.0, 1.0],
                "depth_scale": 1.0,
            }
            poses[(cls, frame_id)] = (R, t)

        with open(cls_dir / "gt.yml", "w") as f:
            yaml.safe_dump(gt, f)
        with open(cls_dir / "info.yml", "w") as f:
            yaml.safe_dump(info, f)
        for split in ("train", "test"):
            with open(cls_dir / f"{split}.txt", "w") as f:
                f.write("\n".join(frames))
    return str(root), poses


def test_convert_and_load(tmp_path, linemod_tree):
    root, poses = linemod_tree
    out = str(tmp_path / "records")
    counts = linemod.convert_dataset(root, out, split="train", classes=[1, 4])
    assert counts == {0: 3, 2: 3}

    path = linemod.record_path(out, "train", 0)
    assert os.path.basename(path) == "train_files_FPS512_0_adapt_threshold.tfrecords"
    samples = list(linemod.load_converted(path))
    assert len(samples) == 3
    s = samples[0]
    assert s.class_id == 0
    assert s.xyz.shape == (512, 3)
    assert s.num_valid_points_in_segment >= 512

    # geometry: the FPS cloud sits on the rendered surface at the gt pose
    R, t = poses[(1, s.frame_id)]
    assert np.allclose(s.translation, t, atol=1e-6)
    assert np.allclose(s.rotation_mat, R, atol=1e-6)
    # axisangle consistent with the rotation matrix
    R_back = np.asarray(so3.exp_map(jnp.asarray(s.axisangle, jnp.float32)))
    assert np.max(np.abs(R_back - R)) < 1e-3
    # points within the ball radius + quantization of the gt surface
    d = np.linalg.norm(s.xyz - t, axis=1)
    assert abs(d.mean() - 0.05) < 5e-3


def test_tf_cross_reads_converted(tmp_path, linemod_tree):
    tf = pytest.importorskip("tensorflow")
    root, _ = linemod_tree
    out = str(tmp_path / "records")
    linemod.convert_dataset(root, out, split="train", classes=[1])
    path = linemod.record_path(out, "train", 0)
    recs = list(tf.data.TFRecordDataset(path))
    ex = tf.io.parse_single_example(
        recs[0],
        {
            "class_id": tf.io.FixedLenFeature([], tf.int64),
            "xyz": tf.io.FixedLenFeature([512, 3], tf.float32),
            "rotation_mat": tf.io.FixedLenFeature([9], tf.float32),
        },
    )
    assert int(ex["class_id"].numpy()) == 0
    assert ex["xyz"].shape == (512, 3)
