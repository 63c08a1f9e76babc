"""Configuration tree for cloudaae_tpu.

The reference scatters its de-facto configuration across module constants,
argparse groups, and in-graph literals (SURVEY.md §5.6).  Here every one of
them is a named dataclass field, with the reference source cited so parity
can be audited:

  - class names / count             train_cloudAAE_ycbv.py:26-29
  - data paths                      train_cloudAAE_ycbv.py:31,38
  - loss weights 1000/10/1          train_cloudAAE_ycbv.py:268
  - BN decay schedule               train_cloudAAE_ycbv.py:166-169,196-202
  - sensor noise sigma 0.004/3      train_cloudAAE_ycbv.py:217-218
  - RNG seed 123456789              train_cloudAAE_ycbv.py:160
  - HPR param 0.8*pi                train_cloudAAE_ycbv.py:103-105
  - frustum / camera parameters     utils/generate_occluder.py:38-51,
                                    utils/sample_pose_in_frustum.py:127-137
  - eval distance threshold 0.2m    evaluate_cloudAAE_ycbv.py:40,383
  - eval sequence table             evaluate_cloudAAE_ycbv.py:43-63
  - outlier removal 100pts/0.02m    evaluate_cloudAAE_ycbv.py:279
  - argparse defaults               train_cloudAAE_ycbv.py:440-467,
                                    evaluate_cloudAAE_ycbv.py:661-688
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

YCB_CLASS_NAMES: tuple[str, ...] = (
    "00_master_chef_can", "01_cracker_box", "02_sugar_box",
    "03_tomato_soup_can", "04_mustard_bottle", "05_tuna_fish_can",
    "06_pudding_box", "07_gelatin_box", "08_potted_meat_can", "09_banana",
    "10_pitcher_base", "11_bleach_cleanser", "12_bowl", "13_mug",
    "14_power_drill", "15_wood_block", "16_scissors", "17_large_marker",
    "18_large_clamp", "19_extra_large_clamp", "20_foam_brick",
)
YCB_NUM_CLASS = 21

# Per-class YCB test sequences (evaluate_cloudAAE_ycbv.py:43-63).
YCB_VALID_SEQ_ID: tuple[tuple[int, ...], ...] = (
    (48, 51, 55, 56), (50, 54, 59), (49, 51, 54, 55, 58),
    (50, 51, 53, 55, 57, 59), (50, 52), (48, 49, 52, 59), (58,), (58,),
    (49, 53, 59), (50, 56), (52, 56, 58), (51, 54, 55, 57), (49, 53),
    (48, 55), (50, 54, 56, 59), (55,), (51,), (57, 59), (48, 54), (48, 57),
    (57,),
)

# LINEMOD class handling: classes 3 and 7 are skipped by the converter
# (linemod_data/linemod_to_tfrecord_small.py:255-266).
LINEMOD_SKIPPED_CLASSES: tuple[int, ...] = (3, 7)
LINEMOD_NUM_CLASS = 13


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera + viewing-frustum parameters for pose/occluder sampling.

    The reference evaluates ``tan(vertical_fov / 2)`` with fov given as the
    *number* 45.0 and TF's ``tan`` operating in radians
    (utils/sample_pose_in_frustum.py:45) — i.e. the frustum dimensions come
    from tan(22.5 rad), not tan(22.5 deg).  We preserve that numeric behavior
    (``fov_in_degrees=False``) because the training-data statistics (occluder
    placement spread) depend on it; set ``fov_in_degrees=True`` for the
    geometrically-intended frustum.
    """

    vertical_fov: float = 45.0
    fov_in_degrees: bool = False
    near: float = 0.5
    far: float = 1.0
    aspect_ratio: float = 58.0 / 45.0
    # Intrinsics used for frustum translation re-projection checks
    # (utils/sample_pose_in_frustum.py:134-138) — LINEMOD primesense values.
    fx: float = 572.4114
    fy: float = 573.57043
    cx: float = 325.2611
    cy: float = 242.04899
    image_width: float = 640.0
    image_height: float = 480.0

    @property
    def half_fov_tan(self) -> float:
        half = self.vertical_fov / 2.0
        if self.fov_in_degrees:
            half = math.radians(half)
        return math.tan(half)


# Frustum parameter sets per dataset (utils/generate_occluder.py:38-51).
YCBV_CAMERA = CameraConfig(near=0.5, far=1.0, aspect_ratio=58.0 / 45.0)
LINEMOD_CAMERA = CameraConfig(near=0.4, far=1.5, aspect_ratio=57.5 / 45.0)


@dataclasses.dataclass(frozen=True)
class SynthConfig:
    """On-line data synthesis parameters (train_cloudAAE_ycbv.py:96-117)."""

    num_model_points: int = 2048        # object model size (obj_models schema)
    num_input_points: int = 256         # NUM_POINT: network input segment
    num_target_points: int = 1024       # NUM_POINT*4: clean recon target
    # Occluders: 2 Gaussian blobs x 200 points, sigma 1cm
    # (utils/generate_occluder.py:58-76).
    num_occluder_blobs: int = 2
    points_per_blob: int = 200
    occluder_sigma: float = 0.01
    # Object-occluder variant (utils/generate_occluder.py:5-35).
    object_occluder_points: int = 512
    # HPR spherical-flip exponent: R = max_norm * 10**param
    # (train_cloudAAE_ycbv.py:105, utils/hidden_point_removal.py:13).
    hpr_param: float = 0.8 * math.pi
    # Visibility quality/speed knob: Polyak-ascent iterations of the support
    # test (ops/hpr.py) — hull-oracle IoU on synthesized scenes: 8 ~ 0.984,
    # 6 ~ 0.975 (mean over seeds).  Default 6: the 8 -> 6 step is
    # loss-trajectory-neutral (scripts/validate_hpr6.py PASS, 400 fresh
    # steps, every loss term within the hpr8 run's own tail noise;
    # runs/validate_hpr6.out) and buys ~22% end-to-end training
    # throughput (runs/perf_probe.out: 53.3 -> 43.6 ms/step at B=128).
    # Archived run configs pin their own value, so evaluation of models
    # trained at 8 is unaffected.
    hpr_iters: int = 6
    hpr_slack: float = 2e-4
    # Test visibility only for the object-model rows in the occluded pass
    # (occluder points still occlude as columns but are never selected).
    # Behaviorally exact w.r.t. the reference whenever >=256 model points
    # are visible: ``convexHull`` returns visible indices in ascending
    # order with model rows first (utils/hidden_point_removal.py:33-40,
    # scene order set at :7), and the input slice takes the first
    # NUM_POINT of them (train_cloudAAE_ycbv.py:210-214), so visible
    # occluder points are out of reach unless fewer than NUM_POINT model
    # points survive.  Saves ~16% of the occluded HPR pass.
    hpr_model_rows_only: bool = True
    # Sensor noise: sigma = 4mm/3 Gaussian per point
    # (train_cloudAAE_ycbv.py:217).
    noise_sigma: float = 0.004 / 3.0
    dataset: str = "ycbv"               # 'ycbv' | 'linemod'

    @property
    def num_occluder_points(self) -> int:
        return self.num_occluder_blobs * self.points_per_blob

    @property
    def camera(self) -> CameraConfig:
        return LINEMOD_CAMERA if self.dataset == "linemod" else YCBV_CAMERA


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """DGCNN-mean-6d architecture (models/pointnet_ycb_23_decoder_4.py:327-455)."""

    name: str = "dgcnn_mean_6d"
    num_class: int = YCB_NUM_CLASS
    num_point: int = 256
    k_neighbor: int = 10                # call site train_cloudAAE_ycbv.py:230
    edge_conv_channels: tuple[int, ...] = (64, 64, 64, 128)
    agg_channels: int = 1024
    decoder_fc: tuple[int, ...] = (1024, 1024)
    head_fc: tuple[int, ...] = (512, 256)
    recon_multiplier: int = 4           # decoder outputs num_point*4 points
    # BN decay schedule (train_cloudAAE_ycbv.py:166-169):
    # bn_decay = min(0.99, 1 - 0.5 * 0.5**(step*B/40)).
    bn_init_decay: float = 0.5
    bn_decay_rate: float = 0.5
    bn_decay_step: float = 40.0
    bn_decay_clip: float = 0.99
    aggregation: str = "mean"           # 'mean' | 'max' variants in the zoo
    encoder: str = "dgcnn"              # 'dgcnn' | 'pointnet' (get_model_pn)
    with_heads: bool = True             # False = plain autoencoder variants
    vae: bool = False                   # get_model_dgcnn_mean_vae variant
    recon_channels: int = 3             # 5 for the `_hand` 3+2-channel variant
    # NN compute dtype: 'bfloat16' doubles MXU throughput; parameters, batch
    # norm statistics, kNN geometry, and losses stay float32.
    # matmul/activation compute dtype; params, BN statistics, kNN geometry,
    # and all losses stay float32 (models/layers.py, models/dgcnn.py).
    # bfloat16 is the TPU-native choice: validated over 300 fresh train
    # steps the loss trajectory matches float32 (total 3.61 vs 3.42, axag
    # 1.758 vs 1.768, xyz identical) while the step runs ~4% faster.
    compute_dtype: str = "bfloat16"
    # kNN backend: None = exact lax.top_k (full row sort).  A float (e.g.
    # 0.95) switches the 4 per-block kNN searches to lax.approx_max_k at that
    # recall target — TPU's PartialReduce skips the full sort (~2 ms/step at
    # B=128) at the cost of ~(1-recall) perturbed neighbor entries.  Gated
    # like compute_dtype: over 300 fresh train steps at 0.95 the loss
    # trajectory matches exact top-k (total 3.758 vs 3.712, xyz identical,
    # axag 1.868 vs 1.875) while the step drops 62.1 -> 59.9 ms.
    knn_approx_recall: float | None = 0.95
    # Fused Pallas edge-conv: the per-edge (gather -> BN affine -> relu ->
    # mean-over-k) chain of every EdgeConv block runs in one VMEM-resident
    # kernel (ops.edgeconv_pallas) instead of materializing the (B, N, k, F)
    # edge tensor / one-hot gather operand in HBM.  None = auto (on for TPU
    # backends with aggregation='mean', off on CPU); an implementation
    # choice, not an architecture change — parameter trees and checkpoints
    # are identical either way.  Gated like compute_dtype on the real TPU
    # (scripts/validate_fused.py, 300 fresh train steps): loss trajectory
    # matches the XLA path (final total 3.056 vs 3.079, rel 0.7%); step
    # 54.3 -> 53.1 ms at B=128 — the one-hot MXU gather it replaces was
    # already near-free, so this is a memory-footprint win, not a large
    # latency one.
    edgeconv_fused: bool | None = None
    # Rotation-head representation: 'axag' = 3-vector axis-angle (the
    # reference's head, models/pointnet_ycb_23_decoder_4.py:443-449); '6d' =
    # continuous 6D representation (Zhou et al. CVPR 2019, Gram-Schmidt in
    # so3.rot6d_to_mat).  Axis-angle regression is discontinuous at theta =
    # pi, which caps accuracy when training on full-SO(3) poses
    # (--generate-poses); '6d' removes that obstruction.  The loss/metrics
    # are geodesic on the resulting matrix either way.
    rot_rep: str = "axag"
    # Multi-hypothesis rotation head: predict k rotation hypotheses plus k
    # confidence logits from the same FC trunk (the reference's single
    # 1024-512-256-3 head, models/pointnet_ycb_23_decoder_4.py:443-449,
    # generalized to k outputs).  Trained with a relaxed winner-take-all
    # min-over-hypotheses loss (symmetry.rotation_error_multihyp) so the
    # hypotheses specialize to the discrete modes of view-dependent pose
    # ambiguities (a pitcher whose handle is hidden from some views) that
    # per-class global symmetry groups cannot express.  k = 1 is exactly
    # the reference head (no confidence logits, identical parameter tree).
    num_rot_hyp: int = 1

    @property
    def rot_rep_dim(self) -> int:
        return {"axag": 3, "6d": 6}[self.rot_rep]

    @property
    def rot_out_dim(self) -> int:
        if self.num_rot_hyp == 1:
            return self.rot_rep_dim
        # k hypothesis blocks followed by k confidence logits
        return self.num_rot_hyp * (self.rot_rep_dim + 1)

    @property
    def input_channels(self) -> int:
        return 3 + self.num_class


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights: total = 1000*chamfer + 10*trans + axag
    (train_cloudAAE_ycbv.py:268)."""

    chamfer_weight: float = 1000.0
    trans_weight: float = 10.0
    rot_weight: float = 1.0
    # Symmetry-aware rotation loss (cloudaae_tpu/symmetry.py): when True the
    # rotation term is the min-over-symmetry-group geodesic, with each
    # class's rotational symmetry group auto-detected from its point model
    # (self-Chamfer under candidate rotations about the PCA axes).  The
    # plain geodesic is still logged as `axag_loss` for reference parity.
    rot_sym: bool = False
    sym_max: int = 16          # group table size (identity-padded)
    sym_angles: int = 16       # per-axis candidate angular resolution
    sym_tol: float = 1.6       # p99 self-Chamfer bound, sampling-spacing units
    # Depth-view-equivalent extension (symmetry.detect_view_symmetries):
    # also forgive rotations a depth camera cannot resolve from a typical
    # viewpoint (a can's top-bottom flip) — candidates are scored by the
    # HPR visible-surface residual over sampled views.  sym_max should be
    # raised (32) with this on: a C16 revolution group composed with one
    # flip is 32 elements.
    sym_view: bool = False
    sym_view_tol: float = 1.6  # per-view residual bound, spacing units
    sym_view_frac: float = 0.6 # min fraction of ambiguous views to accept
    # Multi-hypothesis rotation loss (ModelConfig.num_rot_hyp > 1):
    # relaxed winner-take-all — per sample the rotation term is
    # (1 - hyp_relax) * min-over-hypotheses + hyp_relax * mean-over-
    # hypotheses (the epsilon share keeps losing hypotheses trainable
    # instead of dead, cf. Rupprecht et al. ICCV 2017), plus
    # hyp_conf_weight * softmax-CE of the confidence logits against the
    # stop-gradient winner index.  With hyp_relax = 0 and collapsed
    # hypotheses the term equals the single-hypothesis loss exactly
    # (tests/test_multihyp.py).
    hyp_relax: float = 0.05
    hyp_conf_weight: float = 0.1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (train_cloudAAE_ycbv.py:440-467)."""

    batch_size: int = 128
    learning_rate: float = 8e-4
    max_epoch: int = 500
    optimizer: str = "adam"             # 'adam' | 'gd' (gd uses lr*10, :264)
    seed: int = 123456789               # train_cloudAAE_ycbv.py:160
    momentum: float = 0.9
    decay_step: int = 30000
    decay_rate: float = 0.7
    log_every: int = 100
    summary_every: int = 1000           # per-class summaries cadence (:403)
    checkpoint_every_epochs: int = 1    # saved each epoch end (:423-431)
    named_snapshot_every_epochs: int = 50
    # Parallelism: data-parallel size -1 = all devices; optional tensor
    # parallelism over the wide decoder/head FCs.
    dp: int = -1
    tp: int = 1
    donate: bool = True
    train_encoder: bool = True          # False = frozen-encoder finetune
    train_heads: bool = True


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation protocol (evaluate_cloudAAE_ycbv.py)."""

    batch_size: int = 1
    num_point: int = 256
    target_cls: int = 9
    segment_distance_threshold: float = 0.2    # :40,383
    min_points_after_filter: int = 100         # :318
    outlier_nb_points: int = 100               # :279
    outlier_radius: float = 0.02               # :279
    outlier_min_inliers: int = 512             # keep-all fallback (:256-257)
    min_valid_points: int = 256                # = num_point (:372)
    icp: bool = False
    icp_iterations: int = 10                   # :616
    icp_initial_radius: float = 0.01           # :612
    icp_radius_decay: float = 0.9              # :620
    # Per-sample acceptance gate: keep the ICP-refined pose only when the
    # trimmed model->segment alignment residual (ops.icp.alignment_residual)
    # improves over the network pose — makes refinement monotone per class,
    # not just on average (the reference treats ICP as strictly-optional
    # refinement, evaluate_cloudAAE_ycbv.py:606-642).
    icp_accept_gate: bool = True
    icp_gate_keep_frac: float = 0.4            # trimmed fraction (occlusion)
    # Multi-start refinement (with icp_accept_gate): additionally try a
    # centroid-snapped translation start — t + (segment centroid - HPR-
    # visible-model centroid at the network pose) — and ICP from it, and
    # keep the lowest-residual candidate.  Recovers the axial-shift
    # failures of stick-like objects (large_marker: the network
    # occasionally places the pen one length along its own axis; the
    # shifted pose has ~zero segment overlap, so the residual gate
    # separates it from the true pose by orders of magnitude).
    icp_centroid_start: bool = True
    # Multi-hypothesis selection (ModelConfig.num_rot_hyp > 1): score every
    # rotation hypothesis with the trimmed model->segment alignment
    # residual and keep the best, in the ICP-off path too.  The residual
    # needs only the observed depth segment (inference-legal, no GT) and
    # beats the near-uniform trained confidence wherever the view
    # determines the mode — measured mug 36.9 -> 23.9 deg, scissors
    # 25.1 -> 11.5 on the round-5 flagship (runs/analyze_hyps_r5c.json;
    # selector comparison incl. the segment->model direction in
    # docs/MULTIHYP.md).  False restores confidence-argmax selection.
    hyp_residual_select: bool = True
    add_threshold: float = 0.02                # ADD <2cm convention
    add_threshold_diameter_frac: float = 0.1   # ADD <0.1d convention


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset locations and schemas (SURVEY.md §2.9)."""

    data_dir: str = "ycb_video_data_tfRecords"
    train_syn_dir: str = "ycb_video_data_tfRecords/train_syn"
    test_real_dir: str = "ycb_video_data_tfRecords"
    object_model_path: str = "object_model_tfrecord/obj_models.tfrecords"
    shuffle_buffer: int = 1 << 22
    # On-device pose generation instead of reading pose tfrecords
    # (the records themselves were sampled from the same distribution).
    generate_poses: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    synth: SynthConfig = dataclasses.field(default_factory=SynthConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    log_dir: str = "log"

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def _dataclass_from_dict(cls: type, d: dict) -> Any:
    """Rebuild a (flat) config dataclass from an asdict() dict.

    Unknown keys are ignored (older run dirs predate newer fields; newer
    run dirs may carry fields an older checkout lacks) and list values are
    coerced back to the tuples the dataclasses declare.
    """
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kw = {}
    for k, v in d.items():
        if k not in fields:
            continue
        if isinstance(v, list):
            v = tuple(v)
        kw[k] = v
    return cls(**kw)


def config_from_dict(d: dict) -> "Config":
    """Inverse of ``dataclasses.asdict(Config)`` — rebuild the nested tree."""
    return Config(
        synth=_dataclass_from_dict(SynthConfig, d.get("synth", {})),
        model=_dataclass_from_dict(ModelConfig, d.get("model", {})),
        loss=_dataclass_from_dict(LossConfig, d.get("loss", {})),
        train=_dataclass_from_dict(TrainConfig, d.get("train", {})),
        eval=_dataclass_from_dict(EvalConfig, d.get("eval", {})),
        data=_dataclass_from_dict(DataConfig, d.get("data", {})),
        log_dir=d.get("log_dir", "log"),
    )


def config_from_run_dir(run_dir: str) -> "Config":
    """Load the ``config.json`` a training run archived in its run dir
    (metrics.py:37 — the self-archival habit of train_cloudAAE_ycbv.py:151-163),
    so evaluation rebuilds the exact model (rot_rep, dtype, knn mode, ...)
    the checkpoint was trained with."""
    import json
    import os

    with open(os.path.join(run_dir, "config.json")) as f:
        return config_from_dict(json.load(f))


def bn_decay_at(step_times_batch: float, cfg: ModelConfig) -> float:
    """The reference's staircase BN-decay schedule as a pure function.

    ``bn_momentum = init * rate**floor(step*B / decay_step)`` then
    ``bn_decay = min(clip, 1 - bn_momentum)`` (train_cloudAAE_ycbv.py:196-202).
    Works on python floats and jnp arrays alike.
    """
    exponent = step_times_batch / cfg.bn_decay_step
    exponent = exponent // 1.0  # staircase=True
    momentum = cfg.bn_init_decay * cfg.bn_decay_rate ** exponent
    decay = 1.0 - momentum
    if isinstance(decay, float):
        return min(cfg.bn_decay_clip, decay)
    import jax.numpy as jnp

    return jnp.minimum(cfg.bn_decay_clip, decay)
