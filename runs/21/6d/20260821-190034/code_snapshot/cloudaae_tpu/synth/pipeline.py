"""The fused on-line synthesis pipeline.

Logical signature (SURVEY.md §3.4):

    synthesize(model_points, axag, t, key)
        -> {noisy occluded segment (N, 3), clean segment (4N, 3), ...}

mirroring the reference chain ``get_small_data``
(train_cloudAAE_ycbv.py:96-117):

  1. pose -> rotation matrix (axag expmap, :79-85)
  2. transform the 2048-pt object model (:88-93)
  3. inject 2 spherical occluder blobs (:102)
  4. spherical flip + HPR over model+occluder -> occluded visible set,
     first N in index order (:103-107, :210-213)
  5. spherical flip + HPR over the clean model -> occlusion-free visible
     set, first 4N in index order — the reconstruction target (:108-112,
     :211-214)
  6. Gaussian sensor noise sigma=4mm/3 on the network input (:216-218)

Everything is pure jnp: one ``vmap`` + ``jit`` turns pose batches into
training batches entirely on device, which is where the >=10x throughput
over the reference's host-bound py_func pipeline comes from
(SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from cloudaae_tpu import so3
from cloudaae_tpu.config import SynthConfig
from cloudaae_tpu.ops import hpr
from cloudaae_tpu.synth.occluder import spherical_occluder


def synthesize_one(
    model_points: jnp.ndarray,
    axag: jnp.ndarray,
    translation: jnp.ndarray,
    key: jax.Array,
    cfg: SynthConfig,
    hpr_iters: int | None = None,
    hpr_slack: float = 2e-4,
) -> dict[str, Any]:
    """Synthesize one training sample from (object model, 6D pose, rng).

    Args:
      model_points: (num_model_points, 3) object model in object frame
        (xyz channels of the obj_models record).
      axag: (3,) ground-truth rotation (axis-angle).
      translation: (3,) ground-truth translation (meters, camera frame).
      key: PRNG key.
      cfg: synthesis parameters.
    Returns dict:
      input_points: (num_input_points, 3) noisy occluded visible segment —
        the network input before mean-centering.
      target_points: (num_target_points, 3) clean occlusion-free visible
        segment — the reconstruction target.
      rot_mat: (3, 3); occluder: (num_occluder_points, 3);
      num_vis_in / num_vis_org: visible counts (diagnostics).
    """
    k_occ, k_sel_in, k_sel_org, k_noise = jax.random.split(key, 4)
    iters = hpr.DEFAULT_ITERS if hpr_iters is None else hpr_iters

    rot = so3.exp_map(axag)
    posed = so3.transform_points(model_points[..., :3], rot, translation)

    occ = spherical_occluder(k_occ, translation[2], cfg)
    scene = jnp.concatenate([posed, occ], axis=0)

    # Occluded pass: occluder points occlude (columns) but only model rows
    # are tested/selectable — exact vs the reference's first-NUM_POINT
    # slice whenever >=NUM_POINT model points are visible (the ascending-
    # index order of convexHull puts model rows first; see
    # config.SynthConfig.hpr_model_rows_only).
    test_rows = posed.shape[0] if cfg.hpr_model_rows_only else None
    seg, num_vis_in, _ = hpr.hidden_point_removal(
        scene, cfg.num_input_points, k_sel_in, cfg.hpr_param,
        iters=iters, slack=hpr_slack, num_test_rows=test_rows,
    )
    target, num_vis_org, _ = hpr.hidden_point_removal(
        posed, cfg.num_target_points, k_sel_org, cfg.hpr_param,
        iters=iters, slack=hpr_slack,
    )

    noisy = seg + jax.random.normal(k_noise, seg.shape) * cfg.noise_sigma

    return {
        "input_points": noisy,
        "target_points": target,
        "rot_mat": rot,
        "occluder": occ,
        "num_vis_in": num_vis_in,
        "num_vis_org": num_vis_org,
    }


def synthesize_batch(
    obj_models: jnp.ndarray,
    class_id: jnp.ndarray,
    axag: jnp.ndarray,
    translation: jnp.ndarray,
    key: jax.Array,
    cfg: SynthConfig,
    hpr_iters: int | None = None,
    hpr_slack: float = 2e-4,
) -> dict[str, Any]:
    """Vmapped synthesis over a pose batch.

    Args:
      obj_models: (num_class, num_model_points, >=3) — all object models;
        lives on device as a constant (the reference embeds the same table
        in its graph, train_cloudAAE_ycbv.py:68-76).
      class_id: (B,) int32; axag, translation: (B, 3); key: single key.
    Returns the dict of :func:`synthesize_one` with a leading batch dim.
    """
    batch = class_id.shape[0]
    keys = jax.random.split(key, batch)
    # obj_models may be host numpy (preferred for closure constants — see
    # parallel/train_step.py); promote inside the trace before indexing.
    models = jnp.asarray(obj_models)[class_id][..., :3]
    return jax.vmap(
        lambda m, a, t, k: synthesize_one(
            m, a, t, k, cfg, hpr_iters=hpr_iters, hpr_slack=hpr_slack
        )
    )(models, axag, translation, keys)
