"""cloudaae_tpu — a TPU-native JAX framework for 6D object pose estimation.

A ground-up rebuild of the capabilities of CloudAAE (ICRA 2021,
``/root/reference``): on-line point-cloud data synthesis (pose sampling,
occluder injection, hidden-point removal) fused with an augmented
autoencoder (DGCNN encoder, FC decoder, rotation/translation heads) into a
single XLA program, batch-sharded over a TPU mesh with ``jax.sharding``.

The reference is a TF-1.12 single-GPU research codebase whose hot path
bounces between host ``py_func``s (scipy ConvexHull) and the GPU every
record.  Here everything after the (tiny) pose-record lookup is pure,
jittable, and on-device:

    poses (B,3)+(B,3)+(B,) ─► synthesize ─► DGCNN ─► losses ─► optax update
                              └────────────── one jit ──────────────┘

Layer map (mirrors SURVEY.md §1/§7):
  ops/        device kernels: chamfer, FPS, kNN/edge features, HPR,
              gather/prob_sample, radius-outlier, ICP  (L0')
  so3         exp/log map, geodesic error, quat<->axis-angle      (L1')
  models/     NN layers (conv-as-matmul + EMA batch-norm) and the
              DGCNN model zoo                                     (L2'/L3a')
  synth/      on-device data synthesis: frustum pose sampling,
              occluders, full pipeline                            (L3b')
  data/       TFRecord codec (no TensorFlow dependency), YCB-Video
              and LINEMOD datasets                                (L3c')
  parallel/   device meshes, sharding rules, pjit train/eval steps
  train.py / evaluate.py   CLI entry points                       (L4')
"""

__version__ = "0.1.0"

from cloudaae_tpu import so3  # noqa: F401
from cloudaae_tpu.config import Config  # noqa: F401


def __getattr__(name):
    # lazy heavy imports so `import cloudaae_tpu` stays light
    if name == "Predictor":
        from cloudaae_tpu.infer import Predictor

        return Predictor
    if name == "make_model":
        from cloudaae_tpu.models import make_model

        return make_model
    raise AttributeError(name)
