"""LINEMOD end-to-end life beyond the converter (VERDICT round 2 #3):
PLY object-model conversion and the converted-FPS512-record eval path
(evaluate.py --converted-records), the analogue of the reference's
per-class eval protocol (evaluate_cloudAAE_ycbv.py:649-656) over
linemod_to_tfrecord_small.py:189-249 records.
"""

import json
import os

import numpy as np
import pytest

REF = "/root/reference"
HAVE_REF = os.path.exists(os.path.join(REF, "object_model_tfrecord"))


def _write_ply_ascii(path, xyz, rgb=None):
    with open(path, "wb") as f:
        f.write(b"ply\nformat ascii 1.0\n")
        f.write(b"element vertex %d\n" % len(xyz))
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        if rgb is not None:
            f.write(b"property uchar red\nproperty uchar green\n"
                    b"property uchar blue\n")
        f.write(b"element face 0\nproperty list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        for i, p in enumerate(xyz):
            row = "%g %g %g" % tuple(p)
            if rgb is not None:
                row += " %d %d %d" % tuple(rgb[i])
            f.write((row + "\n").encode())


def _write_ply_binary(path, xyz, rgb=None):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex %d\n" % len(xyz))
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        props = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
        if rgb is not None:
            f.write(b"property uchar red\nproperty uchar green\n"
                    b"property uchar blue\n")
            props += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        f.write(b"end_header\n")
        rows = np.zeros(len(xyz), dtype=np.dtype(props))
        rows["x"], rows["y"], rows["z"] = xyz.T.astype(np.float32)
        if rgb is not None:
            rows["red"], rows["green"], rows["blue"] = rgb.T
        f.write(rows.tobytes())


@pytest.mark.parametrize("fmt", ["ascii", "binary"])
def test_read_ply_roundtrip(tmp_path, fmt):
    from cloudaae_tpu.data.linemod import read_ply

    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(37, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, size=(37, 3)).astype(np.uint8)
    path = str(tmp_path / f"m_{fmt}.ply")
    (_write_ply_ascii if fmt == "ascii" else _write_ply_binary)(path, xyz, rgb)
    got_xyz, got_rgb = read_ply(path)
    np.testing.assert_allclose(got_xyz, xyz, rtol=1e-5)
    np.testing.assert_allclose(got_rgb, rgb / 255.0, atol=1e-6)

    # colorless ply -> rgb of ones
    path2 = str(tmp_path / f"m2_{fmt}.ply")
    (_write_ply_ascii if fmt == "ascii" else _write_ply_binary)(path2, xyz)
    got_xyz2, got_rgb2 = read_ply(path2)
    np.testing.assert_allclose(got_xyz2, xyz, rtol=1e-5)
    assert np.all(got_rgb2 == 1.0)


def test_convert_object_models(tmp_path):
    """PLY meshes -> YCB-schema object-model tfrecord, mm -> m, fixed
    point count by FPS (dense mesh) or resample (sparse mesh)."""
    from cloudaae_tpu.data.linemod import convert_object_models
    from cloudaae_tpu.data.ycb import load_object_models

    rng = np.random.default_rng(1)
    root = tmp_path / "lm"
    os.makedirs(root / "models")
    # class 1 dense (200 verts), class 2 sparse (40 verts); units are mm
    for cls, n in ((1, 200), (2, 40)):
        _write_ply_ascii(
            str(root / "models" / f"obj_{cls:02d}.ply"),
            rng.normal(scale=50.0, size=(n, 3)),  # ~5 cm in mm
            rng.integers(0, 256, size=(n, 3)),
        )
    out = str(tmp_path / "obj_models.tfrecords")
    models = convert_object_models(str(root), out, num_points=64,
                                   classes=[1, 2])
    assert models.shape == (2, 64, 6)
    # mm -> m: a 50 mm-scale blob lands at 0.05 m scale
    assert 0.01 < np.abs(models[..., :3]).max() < 0.5
    loaded = load_object_models(out)
    np.testing.assert_allclose(loaded, models, rtol=1e-6)


@pytest.mark.skipif(not HAVE_REF, reason="reference data absent")
def test_evaluate_converted_records_end_to_end(tmp_path):
    """Train a 1-step LINEMOD model, then evaluate converted FPS512 records
    through the CLI: load_converted -> FPS -> model -> ADD/ADD-S."""
    from cloudaae_tpu import evaluate, train
    from cloudaae_tpu.data import tfrecord
    from cloudaae_tpu.data.linemod import (
        LinemodSample, NUM_POINT, record_path, sample_bytes,
    )
    from cloudaae_tpu.data.ycb import load_object_models
    from scipy.spatial.transform import Rotation

    obj_path = os.path.join(REF, "object_model_tfrecord/obj_models.tfrecords")
    train.main(
        [
            "--dataset", "linemod",
            "--generate-poses",
            "--object-models", obj_path,
            "--batch-size", "8",
            "--num-point", "64",
            "--hpr-iters", "4",
            "--max-steps", "1",
            "--max-epoch", "1",
            "--log-every", "1",
            "--log-dir", str(tmp_path / "log"),
        ]
    )
    run = next((tmp_path / "log" / "13" / "6d").iterdir())

    # synthesize converted records: posed object-model points stand in for
    # the backprojected depth segment (the record schema is the contract)
    obj_models = load_object_models(obj_path)
    rng = np.random.default_rng(2)
    recs = []
    for cls in (0, 5):
        for frame in range(3):
            R = Rotation.random(random_state=rng).as_matrix()
            t = np.array([0.01, -0.02, 0.8])
            pick = rng.choice(obj_models.shape[1], NUM_POINT, replace=False)
            pts = obj_models[cls, pick, :3] @ R.T + t
            pts += rng.normal(scale=0.001, size=pts.shape)
            recs.append(
                LinemodSample(
                    class_id=cls,
                    frame_id=frame,
                    rotation_mat=R,
                    axisangle=Rotation.from_matrix(R).as_rotvec(),
                    translation=t,
                    num_valid_points_in_segment=NUM_POINT,
                    xyz=pts,
                    rgb=np.ones_like(pts) * 0.5,
                    data_source=1,
                )
            )
    rec_file = record_path(str(tmp_path), "test", 0)
    tfrecord.write_tfrecord(rec_file, (sample_bytes(s) for s in recs))

    results = evaluate.main(
        [
            "--trained-model", str(run),
            "--converted-records", rec_file,
            "--object-models", obj_path,
            "--data-root", REF,
        ]
    )
    assert sorted(results) == [0, 5]
    for cls, res in results.items():
        assert res.frames == 3, cls
        assert np.isfinite(res.trans_err) and np.isfinite(res.axag_err)
        assert np.isfinite(res.add) and np.isfinite(res.add_s)
        # a GT-posed model cloud has near-zero ADD-S floor ceiling: the
        # untrained net is garbage, but the metric must stay in range
        assert 0.0 <= res.add_s_01d <= 1.0


@pytest.mark.skipif(not HAVE_REF, reason="reference mount absent")
def test_evaluate_converted_icp_both_pairs():
    """evaluate_converted(icp="both") returns (off, on) where off matches a
    plain icp=False run (shared record decode + FPS keys)."""
    import jax
    from scipy.spatial.transform import Rotation

    from cloudaae_tpu.config import Config, ModelConfig, SynthConfig
    from cloudaae_tpu.data.linemod import LinemodSample, NUM_POINT
    from cloudaae_tpu.data.ycb import load_object_models
    from cloudaae_tpu.evaluate import evaluate_converted
    from cloudaae_tpu.models import make_model
    from cloudaae_tpu.parallel.train_step import create_train_state

    obj_path = os.path.join(REF, "object_model_tfrecord/obj_models.tfrecords")
    obj_models = load_object_models(obj_path)[:13]
    cfg = Config(
        synth=SynthConfig(dataset="linemod"),
        model=ModelConfig(num_class=13, num_point=64),
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))

    rng = np.random.default_rng(3)
    recs = []
    for frame in range(2):
        R = Rotation.random(random_state=rng).as_matrix()
        t = np.array([0.0, 0.0, 0.9])
        pick = rng.choice(obj_models.shape[1], NUM_POINT, replace=False)
        pts = obj_models[2, pick, :3] @ R.T + t
        recs.append(
            LinemodSample(
                class_id=2, frame_id=frame, rotation_mat=R,
                axisangle=Rotation.from_matrix(R).as_rotvec(),
                translation=t, num_valid_points_in_segment=NUM_POINT,
                xyz=pts, rgb=np.ones_like(pts) * 0.5, data_source=1,
            )
        )

    off, on = evaluate_converted(
        recs, state, model, cfg, obj_models, icp="both"
    )
    plain = evaluate_converted(
        recs, state, model, cfg, obj_models, icp=False
    )
    assert off.frames == on.frames == plain.frames == 2
    assert off.trans_err == pytest.approx(plain.trans_err, abs=1e-6)
    assert off.add == pytest.approx(plain.add, abs=1e-6)
    assert np.isfinite(on.add)
