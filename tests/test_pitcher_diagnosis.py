"""pitcher_base translation regression (VERDICT r4 #3 / next-round #3).

The per-frame diagnosis (scripts/diagnose_trans.py,
runs/diagnose_pitcher_r4.json + _r5.json) identified the cause of the
2.1 cm mean translation error with numbers:

  * NOT preprocessing — segments are 12k-26k px, the FPS segment lies on
    the object surface, and segment size does not correlate with the
    error (corr -0.09);
  * the error is AMBIGUITY-COUPLED — corr 0.51 (r4) / 0.37 (r5) with the
    symmetry-aware rotation error, and the worst frames all carry
    40-173 deg rotation errors: the head regresses the visible-centroid ->
    origin offset, which depends on the assumed orientation, so a wrong
    handle-azimuth hypothesis displaces the regressed origin by
    centimeters (the tall asymmetric pitcher has the largest such offset
    spread in YCB).

These tests pin both halves so a future regression re-opens the right
investigation (the shape of tests/test_eval.py's small-segment pin):
the first guards the preprocessing health facts on the REAL pitcher
model; the second measures the geometric coupling floor itself — the
view-dependence of the offset the head must regress — which is a
property of the geometry, not of any trained network.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudaae_tpu.config import Config
from cloudaae_tpu.data import ycb_real
from cloudaae_tpu.evaluate import eval_preprocess
from cloudaae_tpu import so3

REFERENCE_MODELS = "/root/reference/object_model_tfrecord/obj_models.tfrecords"
PITCHER = 10


@pytest.fixture(scope="module")
def obj_models():
    if not os.path.exists(REFERENCE_MODELS):
        pytest.skip("reference object models not mounted")
    from cloudaae_tpu.data import load_object_models

    return load_object_models(REFERENCE_MODELS)


def test_pitcher_segments_healthy(obj_models):
    """Preprocessing is not the cause: typical working-distance pitcher
    frames yield large on-surface segments with a bounded anchor offset."""
    cfg = Config()
    rng = np.random.default_rng(3)
    for i in range(4):
        axag = rng.normal(size=3).astype(np.float32)
        R = np.asarray(so3.exp_map(jnp.asarray(axag)), np.float32)
        t = np.array([rng.normal(0, 0.03), rng.normal(0, 0.03),
                      rng.uniform(0.65, 0.85)], np.float32)
        frame = ycb_real.render_frame(
            obj_models, [PITCHER], R[None], t[None], frame_id=i,
        )
        pre = eval_preprocess(
            jnp.asarray(frame.depth), jnp.asarray(frame.label),
            jnp.asarray(PITCHER),
            jnp.asarray([frame.fx, frame.fy, frame.cx, frame.cy,
                         frame.factor_depth], jnp.float32),
            jax.random.key(i), cfg.eval.num_point, cfg.eval,
        )
        assert bool(pre["ok"]), i
        # diagnosis measured 12k-26k px across 50 uniform poses
        assert int(pre["num_after_filter"]) > 4000, i
        seg = np.asarray(pre["xyz_inlier"])
        posed = np.asarray(obj_models[PITCHER, :, :3]) @ R.T + t
        d = np.sqrt(((seg[:, None] - posed[None]) ** 2).sum(-1).min(1))
        assert float(d.max()) < 8e-3, (i, float(d.max()))
        # anchor (visible-centroid -> origin) bounded by the object scale
        anchor = float(np.linalg.norm(seg.mean(0) - t))
        assert anchor < 0.13, (i, anchor)


def test_pitcher_anchor_offset_view_spread(obj_models):
    """The geometric coupling floor: the visible-centroid -> origin offset
    the translation head must regress varies by centimeters across
    viewpoints on the pitcher (tall asymmetric shape + self-occlusion).
    With the orientation ambiguous from a single view, this spread IS the
    translation error scale the diagnosis measured (~2 cm mean) — a
    documented geometric limit, not a trainable defect."""
    from cloudaae_tpu.ops.hpr import hpr_visible_mask

    cfg = Config()
    pts = jnp.asarray(obj_models[PITCHER, :, :3], jnp.float32)
    rng = np.random.default_rng(11)
    offsets = []
    for _ in range(16):
        axag = rng.normal(size=3).astype(np.float32)
        R = jnp.asarray(np.asarray(so3.exp_map(jnp.asarray(axag)), np.float32))
        t = jnp.asarray(np.array([0.0, 0.0, 0.75], np.float32))
        posed = jnp.matmul(pts, R.T, precision="highest") + t
        vis = hpr_visible_mask(
            posed, cfg.synth.hpr_param, iters=cfg.synth.hpr_iters,
            slack=cfg.synth.hpr_slack,
        )
        nvis = float(jnp.sum(vis))
        assert nvis > 100
        centroid = np.asarray(
            jnp.sum(jnp.where(vis[:, None], posed, 0.0), axis=0) / nvis
        )
        offsets.append(centroid - np.asarray(t))  # camera-frame offset
    offsets = np.stack(offsets)
    norms = np.linalg.norm(offsets, axis=1)
    # the offset itself is centimeters...
    assert norms.mean() > 0.01
    # ...and its view-to-view spread is centimeters too: the head cannot
    # place the origin without committing to an orientation
    spread = float(np.linalg.norm(offsets.std(axis=0)))
    assert spread > 0.012, spread
