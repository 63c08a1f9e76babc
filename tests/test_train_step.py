"""End-to-end train-step tests on the virtual 8-device CPU mesh.

Covers the minimum end-to-end slice (SURVEY.md §7.5): poses -> on-device
synthesis -> model -> 3-term loss -> Adam, under dp and dp x tp meshes.
Sizes are scaled down for CPU speed; the structure is identical to the
production config.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cloudaae_tpu.config import Config, ModelConfig, SynthConfig, TrainConfig
from cloudaae_tpu.models import make_model
from cloudaae_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
    shard_batch,
)
from cloudaae_tpu.parallel.mesh import shard_params


NUM_CLASS = 4
B = 16


def tiny_config(**train_kw) -> Config:
    return Config(
        synth=SynthConfig(
            num_model_points=256,
            num_input_points=64,
            num_target_points=256,
            points_per_blob=50,
            hpr_iters=5,
        ),
        model=ModelConfig(
            num_class=NUM_CLASS,
            num_point=64,
            k_neighbor=4,
            edge_conv_channels=(16, 16),
            agg_channels=64,
            decoder_fc=(64,),
            head_fc=(32,),
        ),
        train=TrainConfig(batch_size=B, learning_rate=1e-3, **train_kw),
    )


@pytest.fixture(scope="module")
def obj_models():
    rng = np.random.default_rng(0)
    models = []
    for i in range(NUM_CLASS):
        d = rng.normal(size=(256, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        models.append(d * np.array([0.05, 0.03, 0.06]) * (0.8 + 0.1 * i))
    return np.stack(models).astype(np.float32)


def pose_batch(rng, n=B):
    return (
        np.concatenate(
            [rng.normal(0, 0.03, (n, 2)), rng.uniform(0.6, 0.9, (n, 1))], axis=1
        ).astype(np.float32),
        rng.normal(0, 1.0, (n, 3)).astype(np.float32),
        rng.integers(0, NUM_CLASS, n).astype(np.int32),
    )


def test_train_step_runs_and_updates(obj_models):
    cfg = tiny_config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    step_fn = make_train_step(model, cfg, obj_models)
    rng = np.random.default_rng(1)
    batch = pose_batch(rng)
    p_before = jax.device_get(state.params)
    state, m = step_fn(state, batch, jax.random.key(2))
    assert int(state.step) == 1
    for k in ("total_loss", "xyz_loss", "trans_loss", "axag_loss"):
        assert np.isfinite(float(m[k])), k
    assert float(m["axag_loss"]) > 0
    # per-class accumulators account for every sample
    assert int(np.asarray(m["per_class_count"]).sum()) == B
    # parameters actually moved
    p_after = jax.device_get(state.params)
    deltas = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p_before, p_after)
    assert max(jax.tree.leaves(deltas)) > 0


def test_loss_decreases(obj_models):
    cfg = tiny_config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    step_fn = make_train_step(model, cfg, obj_models)
    rng = np.random.default_rng(3)
    batches = [pose_batch(rng) for _ in range(4)]
    losses = []
    key = jax.random.key(4)
    for i in range(28):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batches[i % 4], sub)
        losses.append(float(m["total_loss"]))
    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert last < first * 0.9, f"{first} -> {last}"


def test_dp_mesh_sharded_step(obj_models):
    cfg = tiny_config(dp=8)
    model = make_model(cfg.model)
    mesh = make_mesh(dp=8, tp=1)
    state = create_train_state(model, cfg, jax.random.key(0))
    step_fn = make_train_step(model, cfg, obj_models)
    batch = shard_batch(mesh, pose_batch(np.random.default_rng(5)))
    with mesh:
        state, m = step_fn(state, batch, jax.random.key(6))
    assert np.isfinite(float(m["total_loss"]))
    # batch really is sharded across 8 devices
    assert len(batch[0].sharding.device_set) == 8


def test_dp_tp_mesh_sharded_step(obj_models):
    cfg = tiny_config(dp=4, tp=2)
    model = make_model(cfg.model)
    mesh = make_mesh(dp=4, tp=2)
    state = create_train_state(model, cfg, jax.random.key(0))
    with mesh:
        state = dataclasses.replace(
            state, params=shard_params(mesh, state.params)
        )
        step_fn = make_train_step(model, cfg, obj_models)
        batch = shard_batch(mesh, pose_batch(np.random.default_rng(7)))
        state, m = step_fn(state, batch, jax.random.key(8))
    assert np.isfinite(float(m["total_loss"]))
    # decoder fc kernel is sharded over tp
    k = state.params["decoder"]["fc1"]["dense"]["kernel"]
    assert len(k.sharding.device_set) >= 2


def test_frozen_encoder_masks_updates(obj_models):
    cfg = tiny_config(train_encoder=False)
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    step_fn = make_train_step(model, cfg, obj_models)
    p0 = jax.device_get(state.params)
    state, _ = step_fn(state, pose_batch(np.random.default_rng(9)), jax.random.key(1))
    p1 = jax.device_get(state.params)
    enc_delta = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), p0["encoder"], p1["encoder"]
    )
    head_delta = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), p0["rot_head"], p1["rot_head"]
    )
    assert max(jax.tree.leaves(enc_delta)) == 0.0
    assert max(jax.tree.leaves(head_delta)) > 0.0


def test_eval_step(obj_models):
    cfg = tiny_config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    eval_fn = make_eval_step(model, cfg, obj_models)
    m, preds = eval_fn(state, pose_batch(np.random.default_rng(11)), jax.random.key(3))
    recon, rot, trans = preds
    assert recon.shape == (B, 256, 3)
    assert rot.shape == (B, 3) and trans.shape == (B, 3)
    assert np.isfinite(float(m["trans_loss"]))


def test_table_step_matches_batch_step(obj_models):
    """Slicing the batch from a device-resident table must reproduce the
    plain batch step exactly."""
    from cloudaae_tpu.parallel.train_step import make_train_step_from_table

    cfg = tiny_config()
    model = make_model(cfg.model)
    rng = np.random.default_rng(13)
    n = 3 * B
    table = (
        np.concatenate(
            [rng.normal(0, 0.03, (n, 2)), rng.uniform(0.6, 0.9, (n, 1))], axis=1
        ).astype(np.float32),
        rng.normal(0, 1.0, (n, 3)).astype(np.float32),
        rng.integers(0, NUM_CLASS, n).astype(np.int32),
    )
    key = jax.random.key(5)

    s1 = create_train_state(model, cfg, jax.random.key(0))
    plain = make_train_step(model, cfg, obj_models)
    for i in range(3):
        batch = tuple(a[i * B : (i + 1) * B] for a in table)
        s1, m1 = plain(s1, batch, key)

    s2 = create_train_state(model, cfg, jax.random.key(0))
    table_step = make_train_step_from_table(model, cfg, obj_models)
    dev_table = jax.device_put(table)
    for i in range(3):
        s2, m2 = table_step(s2, dev_table, np.asarray(i * B, np.int32), key)

    assert np.allclose(float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5)
    a = jax.tree.leaves(s1.params)[0]
    b = jax.tree.leaves(s2.params)[0]
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_table_step_on_dp_mesh(obj_models):
    """Table-sliced batches shard across dp under the mesh constraint."""
    from cloudaae_tpu.parallel import shard_state
    from cloudaae_tpu.parallel.train_step import make_train_step_from_table

    cfg = tiny_config(dp=8)
    model = make_model(cfg.model)
    mesh = make_mesh(dp=8, tp=1)
    state = create_train_state(model, cfg, jax.random.key(0))
    rng = np.random.default_rng(21)
    n = 2 * B
    table = (
        np.concatenate(
            [rng.normal(0, 0.03, (n, 2)), rng.uniform(0.6, 0.9, (n, 1))], axis=1
        ).astype(np.float32),
        rng.normal(0, 1.0, (n, 3)).astype(np.float32),
        rng.integers(0, NUM_CLASS, n).astype(np.int32),
    )
    with mesh:
        state = shard_state(mesh, state)
        step_fn = make_train_step_from_table(model, cfg, obj_models, mesh)
        dev_table = jax.device_put(table)
        for i in range(2):
            state, m = step_fn(state, dev_table, np.asarray(i * B, np.int32),
                               jax.random.key(1))
    assert np.isfinite(float(m["total_loss"]))
    assert int(state.step) == 2


def test_real_data_train_step_and_encoder_transfer(obj_models):
    """The shipped checkpoint's recipe: frozen encoder transferred from a
    synthetic run, heads finetuned on real pre-sampled segments."""
    from cloudaae_tpu import checkpoint, so3
    from cloudaae_tpu.parallel.train_step import make_train_step_real

    # a 'synthetic-pretrained' source state
    cfg_syn = tiny_config()
    model = make_model(cfg_syn.model)
    src = create_train_state(model, cfg_syn, jax.random.key(1))

    # destination: frozen-encoder finetune config
    cfg = tiny_config(train_encoder=False)
    dst = create_train_state(model, cfg, jax.random.key(2))
    dst = checkpoint.transfer_encoder(src, dst)
    a = jax.tree.leaves(src.params["encoder"])[0]
    b = jax.tree.leaves(dst.params["encoder"])[0]
    assert np.allclose(np.asarray(a), np.asarray(b))

    # fake FPS-presampled real segments: gt-posed model points
    rng = np.random.default_rng(3)
    cls = rng.integers(0, NUM_CLASS, B).astype(np.int32)
    axag = rng.normal(0, 1.0, (B, 3)).astype(np.float32)
    quat = np.asarray(so3.axag_to_quat(jnp.asarray(axag)))
    trans = np.concatenate(
        [rng.normal(0, 0.03, (B, 2)), rng.uniform(0.6, 0.9, (B, 1))], axis=1
    ).astype(np.float32)
    R = np.asarray(so3.exp_map(jnp.asarray(axag)))
    xyz_full = np.einsum("bij,bnj->bni", R, obj_models[cls]) + trans[:, None]
    batch = (xyz_full.astype(np.float32), quat, trans, cls)

    step_fn = make_train_step_real(model, cfg, obj_models)
    p0 = jax.device_get(dst.params)
    state = dst
    for _ in range(2):
        state, m = step_fn(state, batch, jax.random.key(4))
    assert np.isfinite(float(m["total_loss"]))
    p1 = jax.device_get(state.params)
    enc_delta = jax.tree.map(
        lambda x, y: float(np.abs(x - y).max()), p0["encoder"], p1["encoder"]
    )
    head_delta = jax.tree.map(
        lambda x, y: float(np.abs(x - y).max()), p0["rot_head"], p1["rot_head"]
    )
    assert max(jax.tree.leaves(enc_delta)) == 0.0  # encoder frozen
    assert max(jax.tree.leaves(head_delta)) > 0.0  # heads train


def test_rot6d_head_train_step(obj_models):
    """rot_rep='6d' (so3.rot6d_to_mat head): the step runs, the head emits
    6 values, and the geodesic metrics stay well-defined."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, rot_rep="6d")
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    # head output dim follows the representation
    x = np.zeros((2, cfg.model.num_point, 3 + NUM_CLASS), np.float32)
    _, rot, _, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x
    )
    assert rot.shape == (2, 6)

    step_fn = make_train_step(model, cfg, obj_models)
    rng = np.random.default_rng(3)
    new_state, metrics = step_fn(state, pose_batch(rng), jax.random.key(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert 0.0 <= float(metrics["axag_loss"]) <= np.pi + 1e-3
    assert int(new_state.step) == 1


def test_rot6d_head_loss_decreases(obj_models):
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, rot_rep="6d")
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    step_fn = make_train_step(model, cfg, obj_models)
    rng = np.random.default_rng(5)
    batch = pose_batch(rng)
    losses = []
    for i in range(30):
        state, metrics = step_fn(state, batch, jax.random.key(42))
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0] * 0.7


def test_rot6d_with_symmetry_loss(obj_models):
    """6d head composes with the symmetry-aware rotation loss."""
    from cloudaae_tpu import symmetry

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, rot_rep="6d"),
        loss=dataclasses.replace(cfg.loss, rot_sym=True),
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    step_fn = make_train_step(model, cfg, obj_models)
    rng = np.random.default_rng(7)
    _, metrics = step_fn(state, pose_batch(rng), jax.random.key(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # sym error is a min over a group containing identity: <= plain error
    assert (float(metrics["axag_sym_loss"])
            <= float(metrics["axag_loss"]) + 1e-5)
