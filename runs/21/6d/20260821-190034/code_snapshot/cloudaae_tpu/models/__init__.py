"""Neural-network layers and the CloudAAE model zoo (flax).

TPU-native equivalents of ``utils/tf_util.py`` (layer library) and
``models/pointnet_ycb_23_decoder_4.py`` (7 architectures).  The reference's
1x1 "convolutions" over (B, N, k, C) are plain Dense layers on the channel
axis — on TPU they compile to the same MXU matmuls without the conv
ceremony.
"""

from cloudaae_tpu.models.layers import (
    ConvND,
    ConvTranspose2D,
    Dense,
    Dropout,
    EmaBatchNorm,
    EmaBatchNormAffine,
    PointMLP,
    avg_pool,
    max_pool,
)
from cloudaae_tpu.models.dgcnn import CloudAAE, apply_preset, make_model

__all__ = [
    "ConvND", "ConvTranspose2D", "Dense", "Dropout", "EmaBatchNorm",
    "EmaBatchNormAffine", "PointMLP", "avg_pool", "max_pool",
    "CloudAAE", "apply_preset", "make_model",
]
