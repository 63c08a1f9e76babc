"""Data-layer tests: TFRecord codec round-trips, cross-checks against
TensorFlow's own reader/writer, and parsing the real shipped records.
"""

import os

import numpy as np
import pytest

from cloudaae_tpu.data import tfrecord
from cloudaae_tpu.data.ycb import PoseBatcher, load_object_models, load_pose_records

REF = "/root/reference"
OBJ_MODELS = os.path.join(REF, "object_model_tfrecord/obj_models.tfrecords")
TRAIN_SYN = os.path.join(REF, "ycb_video_data_tfRecords/train_syn")


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tfrecord.crc32c(b"123456789") == 0xE3069283


def test_example_roundtrip(tmp_path):
    feats = {
        "floats": np.arange(12, dtype=np.float32).reshape(3, 4),
        "ints": np.array([1, -2, 3], np.int64),
        "blob": b"hello",
    }
    payload = tfrecord.example_bytes(feats)
    parsed = tfrecord.parse_example(payload)
    assert np.allclose(parsed["floats"].float_list, feats["floats"].ravel())
    assert np.array_equal(parsed["ints"].int64_list, feats["ints"])
    assert parsed["blob"].bytes_list == [b"hello"]

    path = str(tmp_path / "rt.tfrecords")
    n = tfrecord.write_tfrecord(path, [payload, payload])
    assert n == 2
    back = list(tfrecord.iter_tfrecord(path, verify=True))
    assert back == [payload, payload]


def test_tensorflow_can_read_our_records(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "ours.tfrecords")
    payload = tfrecord.example_bytes(
        {"x": np.array([1.5, -2.5], np.float32), "n": np.array([7], np.int64)}
    )
    tfrecord.write_tfrecord(path, [payload])
    ds = list(tf.data.TFRecordDataset(path))
    ex = tf.io.parse_single_example(
        ds[0],
        {
            "x": tf.io.FixedLenFeature([2], tf.float32),
            "n": tf.io.FixedLenFeature([], tf.int64),
        },
    )
    assert np.allclose(ex["x"].numpy(), [1.5, -2.5])
    assert int(ex["n"].numpy()) == 7


@pytest.mark.skipif(not os.path.exists(OBJ_MODELS), reason="reference data absent")
def test_load_real_object_models():
    models = load_object_models(OBJ_MODELS)
    assert models.shape == (21, 2048, 6)
    # xyz extents are object-sized (cm..dm); rgb in [0, 1]
    extents = models[..., :3].max(1) - models[..., :3].min(1)
    assert (extents > 0.01).all() and (extents < 0.5).all()
    assert models[..., 3:].min() >= 0.0 and models[..., 3:].max() <= 1.0


@pytest.mark.skipif(not os.path.exists(TRAIN_SYN), reason="reference data absent")
def test_load_real_pose_records_single_class():
    poses = load_pose_records(TRAIN_SYN, classes=[0])
    n = len(poses["class_id"])
    assert n > 10000  # ~18k per class
    assert (poses["class_id"] == 0).all()
    assert poses["translation"].shape == (n, 3)
    # translations in the YCB frustum (z between near and far-ish)
    z = poses["translation"][:, 2]
    assert 0.3 < z.mean() < 1.2
    # axis-angle magnitudes <= pi
    mags = np.linalg.norm(poses["axisangle"], axis=-1)
    assert mags.max() <= np.pi + 1e-4


def test_pose_batcher():
    poses = {
        "translation": np.random.rand(1000, 3).astype(np.float32),
        "axisangle": np.random.rand(1000, 3).astype(np.float32),
        "class_id": np.random.randint(0, 21, 1000).astype(np.int32),
    }
    b = PoseBatcher(poses, batch_size=128)
    batches = list(b.epoch())
    assert len(batches) == 7  # drop remainder
    assert batches[0][0].shape == (128, 3)
    # different epochs shuffle differently
    b2 = list(b.epoch())
    assert not np.allclose(batches[0][0], b2[0][0])


def test_object_model_writer_roundtrip(tmp_path):
    from cloudaae_tpu.data.ycb import write_object_models, load_object_models

    rng = np.random.default_rng(0)
    models = rng.normal(size=(3, 2048, 6)).astype(np.float32)
    models[..., 3:] = np.abs(models[..., 3:]) % 1.0
    path = str(tmp_path / "obj.tfrecords")
    assert write_object_models(path, models) == 3
    back = load_object_models(path)
    assert back.shape == (3, 2048, 6)
    assert np.allclose(back, models)


def test_pose_record_writer_roundtrip(tmp_path):
    from cloudaae_tpu.data.ycb import write_pose_records, load_pose_records

    rng = np.random.default_rng(1)
    d = tmp_path / "syn"
    d.mkdir()
    n = write_pose_records(
        str(d / "0_syn.tfrecords"),
        rng.normal(size=(10, 3)).astype(np.float32),
        rng.normal(size=(10, 3)).astype(np.float32),
        np.zeros(10, np.int64),
    )
    assert n == 10
    poses = load_pose_records(str(d), classes=[0])
    assert len(poses["class_id"]) == 10


def test_truncated_tfrecord_raises(tmp_path):
    payload = tfrecord.example_bytes({"x": np.zeros(3, np.float32)})
    path = str(tmp_path / "t.tfrecords")
    tfrecord.write_tfrecord(path, [payload])
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[:-6])  # chop the payload crc + tail
    with pytest.raises(ValueError, match="truncated"):
        list(tfrecord.iter_tfrecord(path))


def test_corrupt_crc_detected_when_verifying(tmp_path):
    payload = tfrecord.example_bytes({"x": np.zeros(3, np.float32)})
    path = str(tmp_path / "c.tfrecords")
    tfrecord.write_tfrecord(path, [payload])
    data = bytearray(open(path, "rb").read())
    data[14] ^= 0xFF  # flip a payload byte
    with open(path, "wb") as f:
        f.write(data)
    with pytest.raises(ValueError, match="crc"):
        list(tfrecord.iter_tfrecord(path, verify=True))
    # without verification the (corrupt) payload still round-trips the framing
    assert len(list(tfrecord.iter_tfrecord(path))) == 1


def test_fps_record_roundtrip(tmp_path):
    from cloudaae_tpu.data.ycb_real import (
        fps_record_bytes, load_fps_records, parse_fps_record,
    )

    rng = np.random.default_rng(2)
    rec = {
        "xyz": rng.normal(size=(1024, 3)).astype(np.float32),
        "rgb": rng.random((1024, 3)).astype(np.float32),
        "translation": rng.normal(size=3).astype(np.float32),
        "quaternion": rng.normal(size=4).astype(np.float32),
        "num_valid_points_in_segment": 800,
        "seq_id": 48,
        "frame_id": 12,
        "class_id": 7,
    }
    payload = fps_record_bytes(rec)
    back = parse_fps_record(payload)
    assert np.allclose(back["xyz"], rec["xyz"])
    assert back["class_id"] == 7 and back["seq_id"] == 48

    path = str(tmp_path / "real.tfrecords")
    tfrecord.write_tfrecord(path, [payload, payload])
    table = load_fps_records([path])
    assert table["xyz"].shape == (2, 1024, 3)
    assert (table["class_id"] == 7).all()
