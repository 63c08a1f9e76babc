"""Multi-hypothesis rotation head (ModelConfig.num_rot_hyp > 1).

Covers the VERDICT r4 contract: the k-hypothesis loss equals the k = 1
loss when hypotheses collapse; the winner-take-all min rewards any one
correct hypothesis; the head/model plumbing (output dim, selection,
warm-start transfer) round-trips.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cloudaae_tpu import checkpoint, so3, symmetry
from cloudaae_tpu.config import Config, LossConfig, ModelConfig
from cloudaae_tpu.models import make_model
from cloudaae_tpu.parallel import create_train_state, make_train_step

from test_train_step import NUM_CLASS, B, obj_models, pose_batch, tiny_config  # noqa: F401


def _random_rots(rng, *shape):
    from scipy.spatial.transform import Rotation

    n = int(np.prod(shape))
    return Rotation.random(n, random_state=rng).as_matrix().reshape(
        *shape, 3, 3
    ).astype(np.float32)


def _sym_table(rng, b, s):
    """Identity-padded per-sample symmetry groups (first entry identity)."""
    tab = np.tile(np.eye(3, dtype=np.float32), (b, s, 1, 1))
    tab[:, 1] = _random_rots(rng, b)  # one nontrivial symmetry
    return tab


def test_collapsed_hypotheses_equal_single_loss():
    rng = np.random.default_rng(0)
    b, k, s = 8, 4, 3
    label = rng.normal(0, 1.0, (b, 3)).astype(np.float32)
    R_one = _random_rots(rng, b)
    R_hyps = jnp.asarray(np.repeat(R_one[:, None], k, axis=1))
    sym = jnp.asarray(_sym_table(rng, b, s))

    # any relax: with identical hypotheses min == mean == single loss
    for relax in (0.0, 0.05, 0.5):
        loss, per, winner = symmetry.rotation_error_multihyp(
            R_hyps, jnp.asarray(label), sym, relax=relax
        )
        ref_loss, ref_per = symmetry.rotation_error_sym_mat(
            jnp.asarray(R_one), jnp.asarray(label), sym
        )
        np.testing.assert_allclose(np.asarray(per), np.asarray(ref_per),
                                   atol=1e-5)
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)

    # no symmetry table: reduces to the plain geodesic
    loss, per, _ = symmetry.rotation_error_multihyp(
        R_hyps, jnp.asarray(label), None, relax=0.0
    )
    ref_loss, ref_per = so3.rotation_error_mat(
        jnp.asarray(R_one), jnp.asarray(label)
    )
    np.testing.assert_allclose(np.asarray(per), np.asarray(ref_per), atol=1e-5)


def test_wta_min_rewards_any_correct_hypothesis():
    rng = np.random.default_rng(1)
    b, k = 6, 4
    label = rng.normal(0, 1.0, (b, 3)).astype(np.float32)
    R_gt = np.asarray(so3.exp_map(jnp.asarray(label)))
    R_hyps = _random_rots(rng, b, k)
    correct = rng.integers(0, k, b)
    for i in range(b):
        R_hyps[i, correct[i]] = R_gt[i]

    loss, per, winner = symmetry.rotation_error_multihyp(
        jnp.asarray(R_hyps), jnp.asarray(label), None, relax=0.0
    )
    np.testing.assert_allclose(np.asarray(per), 0.0, atol=2e-3)
    assert np.array_equal(np.asarray(winner), correct)

    # relax > 0 pulls in the losing hypotheses but keeps the min term
    loss_r, per_r, _ = symmetry.rotation_error_multihyp(
        jnp.asarray(R_hyps), jnp.asarray(label), None, relax=0.1
    )
    np.testing.assert_allclose(np.asarray(per_r), 0.0, atol=2e-3)
    assert float(loss_r) > float(loss)


def test_split_hypotheses_layout():
    rng = np.random.default_rng(2)
    k, d = 4, 6
    rot = rng.normal(size=(2, k * (d + 1))).astype(np.float32)
    hyps, conf = so3.split_hypotheses(jnp.asarray(rot), d, k)
    assert hyps.shape == (2, k, d)
    assert conf.shape == (2, k)
    np.testing.assert_array_equal(np.asarray(hyps[0, 1]), rot[0, d:2 * d])
    np.testing.assert_array_equal(np.asarray(conf), rot[:, k * d:])
    # k = 1: passthrough + zero logit
    h1, c1 = so3.split_hypotheses(jnp.asarray(rot[:, :d]), d, 1)
    assert h1.shape == (2, 1, d)
    np.testing.assert_array_equal(np.asarray(h1[:, 0]), rot[:, :d])
    np.testing.assert_array_equal(np.asarray(c1), 0.0)


def test_model_output_dim_multihyp():
    cfg = ModelConfig(num_class=4, num_point=64, k_neighbor=4,
                      edge_conv_channels=(16, 16), agg_channels=64,
                      decoder_fc=(64,), head_fc=(32,),
                      rot_rep="6d", num_rot_hyp=4)
    assert cfg.rot_out_dim == 4 * 7
    model = make_model(cfg)
    x = jnp.zeros((2, 64, 3 + 4), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    recon, rot, trans, _ = model.apply(variables, x)
    assert rot.shape == (2, 28)
    assert trans.shape == (2, 3)


def test_transfer_compatible_across_head_change(obj_models):  # noqa: F811
    cfg1 = tiny_config()
    cfg4 = dataclasses.replace(
        cfg1, model=dataclasses.replace(cfg1.model, num_rot_hyp=4)
    )
    m1, m4 = make_model(cfg1.model), make_model(cfg4.model)
    s1 = create_train_state(m1, cfg1, jax.random.key(0))
    s4 = create_train_state(m4, cfg4, jax.random.key(1))

    new, skipped = checkpoint.transfer_compatible(
        s1.params, s1.batch_stats, s4
    )
    # only the rot-head output layer (whose dim changed) stays fresh
    assert skipped == ["params/rot_head/fc_out/dense/bias",
                       "params/rot_head/fc_out/dense/kernel"] or set(
        skipped
    ) == {"params/rot_head/fc_out/dense/kernel",
          "params/rot_head/fc_out/dense/bias"}
    from flax import traverse_util

    f1 = traverse_util.flatten_dict(s1.params)
    fn = traverse_util.flatten_dict(new.params)
    for path, leaf in fn.items():
        if "fc_out" in str(path) and "rot_head" in str(path):
            continue
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(f1[path]))


def test_train_step_multihyp_runs(obj_models):  # noqa: F811
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, num_rot_hyp=4, rot_rep="6d"),
        loss=LossConfig(hyp_relax=0.05, hyp_conf_weight=0.1),
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    step_fn = make_train_step(model, cfg, obj_models)
    rng = np.random.default_rng(3)
    batch = pose_batch(rng)
    state, m = step_fn(state, batch, jax.random.key(1))
    m = jax.device_get(m)
    assert np.isfinite(m["total_loss"])
    assert np.isfinite(m["conf_ce"])
    assert np.isfinite(m["axag_hyp_min"])
    # the hypothesis-min can never exceed the selected-hypothesis geodesic
    assert m["axag_hyp_min"] <= m["axag_loss"] + 1e-5


def test_eval_forward_selects_confidence_argmax(obj_models):  # noqa: F811
    """With residual selection disabled, ICP-off eval reports the
    confidence-selected hypothesis (the fallback selector)."""
    from cloudaae_tpu import so3
    from cloudaae_tpu.evaluate import make_eval_forward

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_rot_hyp=4, rot_rep="6d"),
        eval=dataclasses.replace(cfg.eval, hyp_residual_select=False),
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = make_eval_forward(model, cfg, obj_models, icp=False)

    rng = np.random.default_rng(5)
    seg = jnp.asarray(
        (obj_models[1][:64] + rng.normal(0, 0.001, (64, 3))
         + np.array([0, 0, 0.7])).astype(np.float32)
    )
    quat = jnp.asarray(np.array([1.0, 0, 0, 0], np.float32))
    tgt = jnp.asarray(np.array([0, 0, 0.7], np.float32))
    out = fwd(variables, seg, seg, jnp.ones(64, bool), jnp.asarray(1),
              quat, tgt, jax.random.key(2))
    out = jax.device_get(out)
    assert np.isfinite(out["axag_err"]) and np.isfinite(out["trans_err"])

    # recompute the hypotheses by hand; the reported rot must be the
    # confidence argmax
    mean = jnp.mean(seg, axis=0)
    onehot = jax.nn.one_hot(1, cfg.model.num_class)
    net_in = jnp.concatenate(
        [seg - mean, jnp.broadcast_to(onehot, (64, cfg.model.num_class))],
        axis=-1,
    )[None]
    _, rot_pred, _, _ = model.apply(variables, net_in)
    hyps, conf = so3.split_hypotheses(rot_pred[0], 6, 4)
    R_all = np.asarray(so3.head_to_mat(hyps, "6d"))
    R_sel = R_all[int(np.argmax(np.asarray(conf)))]
    R_out = np.asarray(so3.exp_map(jnp.asarray(out["rot_pred"])))
    np.testing.assert_allclose(R_out, R_sel, atol=2e-2)


def test_eval_forward_multihyp_icp_gate_runs(obj_models):  # noqa: F811
    """ICP-gate path: residual selection + multi-start refinement compile
    and return finite metrics with a k=4 head."""
    from cloudaae_tpu.evaluate import make_eval_forward

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_rot_hyp=4, rot_rep="6d")
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = make_eval_forward(model, cfg, obj_models, icp=True)

    rng = np.random.default_rng(6)
    seg = jnp.asarray(
        (obj_models[2][:64] + rng.normal(0, 0.001, (64, 3))
         + np.array([0, 0, 0.7])).astype(np.float32)
    )
    out = jax.device_get(
        fwd(variables, seg, seg, jnp.ones(64, bool), jnp.asarray(2),
            jnp.asarray(np.array([1.0, 0, 0, 0], np.float32)),
            jnp.asarray(np.array([0, 0, 0.7], np.float32)),
            jax.random.key(3))
    )
    for k in ("trans_err", "axag_err", "add", "add_s"):
        assert np.isfinite(out[k]), k


def test_cli_rot_hyp_plumbs_into_config():
    from cloudaae_tpu.train import config_from_args, get_parser

    args = get_parser().parse_args(
        ["--rot-rep", "6d", "--rot-hyp", "4", "--generate-poses"]
    )
    cfg = config_from_args(args)
    assert cfg.model.num_rot_hyp == 4
    assert cfg.model.rot_out_dim == 28
    # archived-config round trip rebuilds the same head
    import dataclasses as dc

    from cloudaae_tpu.config import config_from_dict

    cfg2 = config_from_dict(dc.asdict(cfg))
    assert cfg2.model.num_rot_hyp == 4


def test_predictor_hypotheses_surface(obj_models):  # noqa: F811
    from cloudaae_tpu.infer import Predictor
    from cloudaae_tpu.parallel import create_train_state as cts

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_rot_hyp=4, rot_rep="6d")
    )
    model = make_model(cfg.model)
    state = cts(model, cfg, jax.random.key(0))
    pred = Predictor.from_state(state, cfg)
    rng = np.random.default_rng(7)
    segs = (obj_models[:2, :64] + np.array([0, 0, 0.7])).astype(np.float32)
    R_all, conf, t = jax.device_get(
        pred.predict_hypotheses(segs, np.array([0, 1], np.int32))
    )
    assert R_all.shape == (2, 4, 3, 3) and conf.shape == (2, 4)
    np.testing.assert_allclose(conf.sum(-1), 1.0, atol=1e-5)
    # the confidence-argmax hypothesis equals the built-in selection
    R_sel, t_sel = pred(segs, np.array([0, 1], np.int32))
    R_sel = np.asarray(R_sel)
    for b in range(2):
        np.testing.assert_allclose(
            R_sel[b], R_all[b, int(np.argmax(conf[b]))], atol=1e-5
        )


def test_eval_forward_residual_select_icp_off(obj_models):  # noqa: F811
    """Default ICP-off eval selects the hypothesis whose trimmed
    model->segment alignment residual is lowest (EvalConfig.
    hyp_residual_select) — depth-only evidence, no ground truth."""
    from cloudaae_tpu import so3
    from cloudaae_tpu.evaluate import make_eval_forward
    from cloudaae_tpu.ops.icp import alignment_residual

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_rot_hyp=4, rot_rep="6d")
    )
    assert cfg.eval.hyp_residual_select  # the default
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = make_eval_forward(model, cfg, obj_models, icp=False)

    rng = np.random.default_rng(9)
    seg = jnp.asarray(
        (obj_models[1][:64] + rng.normal(0, 0.001, (64, 3))
         + np.array([0, 0, 0.7])).astype(np.float32)
    )
    quat = jnp.asarray(np.array([1.0, 0, 0, 0], np.float32))
    tgt = jnp.asarray(np.array([0, 0, 0.7], np.float32))
    out = jax.device_get(
        fwd(variables, seg, seg, jnp.ones(64, bool), jnp.asarray(1),
            quat, tgt, jax.random.key(2))
    )

    # recompute hypotheses + residuals by hand
    mean = jnp.mean(seg, axis=0)
    onehot = jax.nn.one_hot(1, cfg.model.num_class)
    net_in = jnp.concatenate(
        [seg - mean, jnp.broadcast_to(onehot, (64, cfg.model.num_class))],
        axis=-1,
    )[None]
    _, rot_pred, trans_res, _ = model.apply(variables, net_in)
    t_pred = trans_res[0] + mean
    hyps, _ = so3.split_hypotheses(rot_pred[0], 6, 4)
    R_all = so3.head_to_mat(hyps, "6d")
    mdl = jnp.asarray(np.asarray(obj_models[..., :3], np.float32))[1]
    res = np.asarray([
        float(alignment_residual(
            mdl, seg, R_all[h], t_pred, segment_mask=jnp.ones(64, bool),
            keep_frac=cfg.eval.icp_gate_keep_frac,
        ))
        for h in range(4)
    ])
    R_sel = np.asarray(R_all)[int(np.argmin(res))]
    R_out = np.asarray(so3.exp_map(jnp.asarray(out["rot_pred"])))
    np.testing.assert_allclose(R_out, R_sel, atol=2e-2)


def test_hypothesis_residual_flags_flipped_pose(obj_models):  # noqa: F811
    """ops.icp.hypothesis_residual: the segment->model residual is ~0 at
    the true pose and pays for a flip that moves observed surface; padded
    rows (mask False) never contribute."""
    from cloudaae_tpu.ops.icp import hypothesis_residual
    from scipy.spatial.transform import Rotation

    mdl = jnp.asarray(np.asarray(obj_models[1, :, :3], np.float32))
    n = mdl.shape[0]
    t = jnp.asarray(np.array([0, 0, 0.7], np.float32))
    seg = mdl + t
    segp = jnp.concatenate([seg, jnp.full((64, 3), 1e3, jnp.float32)])
    mask = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(64, bool)])
    r_true = float(jax.jit(hypothesis_residual)(mdl, segp, jnp.eye(3), t, mask))
    Rf = jnp.asarray(
        Rotation.from_euler("x", 180, degrees=True).as_matrix().astype(np.float32)
    )
    r_flip = float(jax.jit(hypothesis_residual)(mdl, segp, Rf, t, mask))
    assert r_true < 1e-8
    assert r_flip > 10 * max(r_true, 1e-9)
    # unmasked call with only the valid rows agrees
    r_nomask = float(hypothesis_residual(mdl, seg, jnp.eye(3), t))
    np.testing.assert_allclose(r_true, r_nomask, atol=1e-9)
