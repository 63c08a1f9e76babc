"""On-device data synthesis — the reference's signature capability
(SURVEY.md §3.4), rebuilt as pure jittable functions.

The reference synthesizes each training sample on the host-bound tf.data
path: pose records -> object model transform -> occluder injection ->
spherical flip -> scipy-ConvexHull HPR -> fixed-size resample -> noise
(train_cloudAAE_ycbv.py:96-117).  Here the whole chain is one vmapped,
jittable function running on TPU, so synthesis happens at training speed
inside the train step with zero host round-trips.
"""

from cloudaae_tpu.synth.frustum import (
    frustum_dims,
    sample_pose,
    sample_rotation,
    sample_translation,
)
from cloudaae_tpu.synth.occluder import spherical_occluder, object_occluder
from cloudaae_tpu.synth.pipeline import synthesize_batch, synthesize_one

__all__ = [
    "frustum_dims",
    "sample_pose",
    "sample_rotation",
    "sample_translation",
    "spherical_occluder",
    "object_occluder",
    "synthesize_batch",
    "synthesize_one",
]
