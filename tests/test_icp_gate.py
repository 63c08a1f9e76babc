"""ICP acceptance gate + centroid-snapped multi-start (EvalConfig knobs).

The mechanism behind evaluate.make_eval_forward's gated refinement:

  * ops.icp.alignment_residual separates a correct pose from a grossly
    shifted one (a stick object slid one body-length along its own axis)
    by orders of magnitude;
  * the centroid-snap candidate — t + (segment centroid − HPR-visible
    model centroid at the predicted pose) — recovers exactly that shift;
  * the gate never accepts a refinement whose residual is worse.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cloudaae_tpu.ops.hpr import hidden_point_removal, hpr_visible_mask
from cloudaae_tpu.ops.icp import alignment_residual, icp_point_to_point

HPR_PARAM = 0.8 * np.pi


def _stick_model(rng, n=512, radius=0.01, length=0.12):
    """Thin cylinder ('large_marker' analogue), object frame, centered."""
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-length / 2, length / 2, n)
    return np.stack(
        [radius * np.cos(theta), radius * np.sin(theta), z], axis=-1
    ).astype(np.float32)


def _scene(rng):
    model = jnp.asarray(_stick_model(rng))
    R_gt = jnp.eye(3)
    t_gt = jnp.asarray([0.02, -0.01, 0.7], jnp.float32)
    posed = model @ R_gt.T + t_gt
    seg, _, _ = hidden_point_removal(
        posed, 512, jax.random.key(0), HPR_PARAM
    )
    mask = jnp.ones(seg.shape[0], bool)
    return model, R_gt, t_gt, seg, mask


def test_residual_separates_axial_shift():
    rng = np.random.default_rng(0)
    model, R_gt, t_gt, seg, mask = _scene(rng)
    res_true = float(alignment_residual(model, seg, R_gt, t_gt, mask))
    # slid one body length along its own axis (the observed failure mode)
    t_bad = t_gt + jnp.asarray([0.0, 0.0, 0.12])
    res_bad = float(alignment_residual(model, seg, R_gt, t_bad, mask))
    assert res_bad > 100 * max(res_true, 1e-12), (res_true, res_bad)


def test_centroid_snap_recovers_axial_shift():
    rng = np.random.default_rng(1)
    model, R_gt, t_gt, seg, mask = _scene(rng)
    t_bad = t_gt + jnp.asarray([0.0, 0.0, 0.12])

    # the eval-forward candidate construction, ops-level
    posed_pred = model @ R_gt.T + t_bad
    vis = hpr_visible_mask(posed_pred, HPR_PARAM)
    nvis = jnp.maximum(jnp.sum(vis), 1)
    vis_centroid = jnp.sum(jnp.where(vis[:, None], posed_pred, 0.0), 0) / nvis
    seg_centroid = jnp.mean(seg, axis=0)
    t_snap = t_bad + seg_centroid - vis_centroid
    # the snap alone recovers to within a couple of cm...
    assert float(jnp.linalg.norm(t_snap - t_gt)) < 0.03
    # ...and ICP from the snapped start finishes the job
    R_ref, t_ref = icp_point_to_point(
        model, seg, R_gt, t_snap, stages=10, segment_mask=mask
    )
    assert float(jnp.linalg.norm(t_ref - t_gt)) < 0.008

    # gate: the snapped+refined candidate wins on residual
    res = [
        float(alignment_residual(model, seg, R_gt, t, mask))
        for t in (t_bad, t_snap, t_ref)
    ]
    assert np.argmin(res) == 2, res


def test_gate_never_accepts_worse():
    rng = np.random.default_rng(2)
    model, R_gt, t_gt, seg, mask = _scene(rng)
    res_net = alignment_residual(model, seg, R_gt, t_gt, mask)
    # a deliberately bad "refinement"
    t_bad = t_gt + jnp.asarray([0.0, 0.0, 0.05])
    res_ref = alignment_residual(model, seg, R_gt, t_bad, mask)
    cands = jnp.stack([t_gt, t_bad])
    best = int(jnp.argmin(jnp.stack([res_net, res_ref])))
    assert bool(jnp.allclose(cands[best], t_gt))


def test_icp_modes_validation():
    """evaluate._icp_modes rejects typo strings instead of bool()ing them."""
    import pytest

    from cloudaae_tpu.evaluate import _icp_modes

    assert _icp_modes(False) == (False,)
    assert _icp_modes(True) == (True,)
    assert _icp_modes("both") == (False, True)
    for bad in ("off", "Both", "on", 1):
        with pytest.raises(ValueError):
            _icp_modes(bad)
