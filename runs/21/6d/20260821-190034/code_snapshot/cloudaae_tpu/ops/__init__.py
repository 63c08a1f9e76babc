"""Device kernels — TPU-native equivalents of the reference's native ops.

Every component from SURVEY.md §2.10 has an equivalent here:

  nn_distance / chamfer        ops.chamfer   (tf_ops/nn_distance/*)
  farthest_point_sample        ops.fps       (tf_ops/sampling/tf_sampling_g.cu:105)
  gather_point / prob_sample   ops.gather    (tf_ops/sampling/*)
  ConvexHull-based HPR         ops.hpr       (utils/hidden_point_removal.py)
  radius outlier removal       ops.outlier   (evaluate_cloudAAE_ycbv.py:250-258)
  ICP refinement               ops.icp       (evaluate_cloudAAE_ycbv.py:606-642)
  kNN / edge features          ops.knn       (utils/tf_util.py:597-706)
"""

from cloudaae_tpu.ops.chamfer import chamfer_loss, nn_distance
from cloudaae_tpu.ops.fps import farthest_point_sample
from cloudaae_tpu.ops.gather import gather_point, prob_sample
from cloudaae_tpu.ops.hpr import hidden_point_removal, spherical_flip
from cloudaae_tpu.ops.knn import edge_feature, knn_indices, pairwise_sq_dist
from cloudaae_tpu.ops.edgeconv_pallas import edge_conv_mean, edge_conv_moments
from cloudaae_tpu.ops.outlier import radius_outlier_mask
from cloudaae_tpu.ops.icp import icp_point_to_point
from cloudaae_tpu.ops.mesh_sample import sample_mesh_surface, triangle_areas

__all__ = [
    "chamfer_loss",
    "nn_distance",
    "farthest_point_sample",
    "gather_point",
    "prob_sample",
    "hidden_point_removal",
    "spherical_flip",
    "edge_feature",
    "edge_conv_mean",
    "edge_conv_moments",
    "knn_indices",
    "pairwise_sq_dist",
    "radius_outlier_mask",
    "icp_point_to_point",
    "sample_mesh_surface",
    "triangle_areas",
]
