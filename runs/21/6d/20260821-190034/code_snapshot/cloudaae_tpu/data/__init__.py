"""Data layer: TFRecord codec and dataset loaders.

The reference reads/writes tf.train.Example TFRecords through TensorFlow
(schemas catalogued in SURVEY.md §2.9).  This framework speaks the same
wire formats with zero TensorFlow dependency: a minimal protobuf-wire
Example codec + the TFRecord framing (length + masked crc32c) implemented
directly — so the shipped YCB pose records, object models, and LINEMOD
conversions interoperate bit-for-bit with the reference's files.
"""

from cloudaae_tpu.data.tfrecord import (
    Feature,
    example_bytes,
    iter_tfrecord,
    parse_example,
    write_tfrecord,
)
from cloudaae_tpu.data.ycb import (
    load_object_models,
    load_pose_records,
    PoseBatcher,
)

__all__ = [
    "Feature",
    "example_bytes",
    "iter_tfrecord",
    "parse_example",
    "write_tfrecord",
    "load_object_models",
    "load_pose_records",
    "PoseBatcher",
]
