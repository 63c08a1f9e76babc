"""Native TFRecord engine tests: C++ vs pure-python reference parity."""

import os

import numpy as np
import pytest

from cloudaae_tpu.data import native, tfrecord

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built / no toolchain"
)

TRAIN_SYN = "/root/reference/ycb_video_data_tfRecords/train_syn"


def test_crc32c_parity():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 9, 64, 1000, 4097):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc32c(data) == tfrecord.crc32c(data)
        assert native.masked_crc(data) == tfrecord.masked_crc(data)


def test_frame_record_verifies(tmp_path):
    payload = tfrecord.example_bytes({"x": np.arange(5, dtype=np.float32)})
    framed = native.frame_record(payload)
    path = str(tmp_path / "one.tfrecords")
    with open(path, "wb") as f:
        f.write(framed)
    back = list(tfrecord.iter_tfrecord(path, verify=True))
    assert back == [payload]


@pytest.mark.skipif(not os.path.isdir(TRAIN_SYN), reason="reference data absent")
def test_native_pose_loader_matches_python():
    path = os.path.join(TRAIN_SYN, "0_syn.tfrecords")
    got = native.load_pose_file(path)
    assert got is not None

    trans, axag, cls = [], [], []
    for payload in tfrecord.iter_tfrecord(path):
        ex = tfrecord.parse_example(payload)
        trans.append(ex["translation"].float_list)
        axag.append(ex["axisangle"].float_list)
        cls.append(int(ex["class_id"].int64_list[0]))
    assert len(got["class_id"]) == len(cls)
    assert np.array_equal(got["translation"], np.stack(trans))
    assert np.array_equal(got["axisangle"], np.stack(axag))
    assert np.array_equal(got["class_id"], np.asarray(cls, np.int32))


@pytest.mark.skipif(not os.path.isdir(TRAIN_SYN), reason="reference data absent")
def test_native_count():
    path = os.path.join(TRAIN_SYN, "0_syn.tfrecords")
    n_native = native.count_records(path)
    n_python = sum(1 for _ in tfrecord.iter_tfrecord(path))
    assert n_native == n_python
