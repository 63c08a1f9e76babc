"""YCB-Video datasets: object models, synthetic pose records, batching.

Schemas (SURVEY.md §2.9, from train_cloudAAE_ycbv.py:46-64):
  object model record: {label: int64, model: float[2048, 6]} (xyz + rgb)
  synthetic pose record: {translation: float[3], axisangle: float[3],
                          class_id: int64}

The poses are the *only* host-side data in training (10 MB for all 381,553
records); they are loaded once into numpy and streamed to the device as
plain index lookups — geometry synthesis happens on the TPU
(synth.pipeline).  Compare SURVEY.md §3.1: the reference re-parses, re-maps
and re-runs scipy hulls per record per epoch on the host.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from cloudaae_tpu.data import tfrecord


def load_object_models(path: str) -> np.ndarray:
    """Load obj_models.tfrecords -> (num_class, P, 6) float32, label-sorted.

    Mirrors ``read_and_decode_obj_model`` (train_cloudAAE_ycbv.py:42-54);
    P = 2048 for the shipped YCB table, but the schema itself fixes only
    the 6 xyz+rgb columns, so smaller tables (e.g. LINEMOD conversions,
    test fixtures) load with the same reader.
    """
    models: list[tuple[int, np.ndarray]] = []
    for payload in tfrecord.iter_tfrecord(path):
        ex = tfrecord.parse_example(payload)
        label = int(ex["label"].int64_list[0])
        model = ex["model"].float_list.reshape(-1, 6)
        models.append((label, model))
    models.sort(key=lambda kv: kv[0])
    return np.stack([m for _, m in models]).astype(np.float32)


def write_object_models(path: str, models: np.ndarray) -> int:
    """Write a (num_class, P, 6) model table in the obj_models schema.

    The inverse of :func:`load_object_models` — lets users of this framework
    build their own object-model tfrecords from mesh samples (e.g. via
    ops.sample_mesh_surface) in the exact format the reference ships.
    """
    def payloads():
        for label, model in enumerate(models):
            yield tfrecord.example_bytes(
                {
                    "label": np.asarray([label], np.int64),
                    "model": np.asarray(model, np.float32),
                }
            )

    return tfrecord.write_tfrecord(path, payloads())


def write_pose_records(path: str, translation, axisangle, class_id) -> int:
    """Write pose records in the train_syn schema (one class per file,
    as the reference's {cls}_syn.tfrecords layout)."""
    def payloads():
        for t, a, c in zip(translation, axisangle, class_id):
            yield tfrecord.example_bytes(
                {
                    "translation": np.asarray(t, np.float32),
                    "axisangle": np.asarray(a, np.float32),
                    "class_id": np.asarray([c], np.int64),
                }
            )

    return tfrecord.write_tfrecord(path, payloads())


def load_pose_records(
    train_syn_dir: str, classes: list[int] | None = None
) -> dict[str, np.ndarray]:
    """Load the per-class synthetic pose tfrecords into flat arrays.

    Files are named ``{cls}_syn.tfrecords`` (train_cloudAAE_ycbv.py:36-39).

    Returns {'translation': (N, 3) f32, 'axisangle': (N, 3) f32,
             'class_id': (N,) i32}.
    """
    from cloudaae_tpu.data import native

    if classes is None:
        classes = sorted(
            int(f.split("_")[0])
            for f in os.listdir(train_syn_dir)
            if f.endswith("_syn.tfrecords")
        )
    parts: list[dict[str, np.ndarray]] = []
    for cls in classes:
        path = os.path.join(train_syn_dir, f"{cls}_syn.tfrecords")
        part = native.load_pose_file(path)  # ~50x the python parser
        if part is None:
            trans, axag, cls_ids = [], [], []
            for payload in tfrecord.iter_tfrecord(path):
                ex = tfrecord.parse_example(payload)
                trans.append(ex["translation"].float_list)
                axag.append(ex["axisangle"].float_list)
                cls_ids.append(int(ex["class_id"].int64_list[0]))
            part = {
                "translation": np.stack(trans).astype(np.float32),
                "axisangle": np.stack(axag).astype(np.float32),
                "class_id": np.asarray(cls_ids, np.int32),
            }
        parts.append(part)
    return {
        k: np.concatenate([p[k] for p in parts]) for k in parts[0]
    }


@dataclass
class PoseBatcher:
    """Shuffled epoch iteration over pose records, host-side.

    Equivalent in role to the reference's
    ``TFRecordDataset(...).shuffle(...)`` + batch(drop_remainder=True)
    (train_cloudAAE_ycbv.py:177-181,114), but the per-batch work is three
    tiny array gathers — all heavy lifting moved on-device.
    """

    poses: dict[str, np.ndarray]
    batch_size: int
    seed: int = 123456789  # reference seed, train_cloudAAE_ycbv.py:160

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)
        self._n = len(self.poses["class_id"])

    @property
    def steps_per_epoch(self) -> int:
        return self._n // self.batch_size

    def shuffled_order(self) -> np.ndarray:
        """One epoch's shuffled record order, truncated to whole batches."""
        return self._rng.permutation(self._n)[
            : self.steps_per_epoch * self.batch_size
        ]

    def epoch(self):
        """Yield (translation, axisangle, class_id) batches for one epoch."""
        order = self._rng.permutation(self._n)
        nb = self.steps_per_epoch
        for i in range(nb):
            idx = order[i * self.batch_size : (i + 1) * self.batch_size]
            yield (
                self.poses["translation"][idx],
                self.poses["axisangle"][idx],
                self.poses["class_id"][idx],
            )
