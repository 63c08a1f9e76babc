"""Checkpointing tests: orbax save/restore round-trip and the TF-name
mapping audited against the SHIPPED reference checkpoint index.

The reference mount carries model.ckpt.{index,meta} but not the data blob
(SURVEY.md §2 inventory), so value-level parity is validated with
synthesized variable tables; the *name and shape* mapping is validated
against the genuine 20200908 checkpoint.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cloudaae_tpu import checkpoint
from cloudaae_tpu.config import Config
from cloudaae_tpu.models import make_model
from cloudaae_tpu.parallel.train_step import create_train_state

REF_CKPT = "/root/reference/trained_network/20200908-204328/model.ckpt"


def flax_paths(tree):
    out = []

    def walk(path, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(path + (k,), v)
        else:
            out.append((path, node))

    walk((), tree)
    return out


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = Config()
    model = make_model(cfg.model)
    x = jnp.zeros((2, 256, 24))
    variables = model.init({"params": jax.random.key(0)}, x)
    return cfg, model, variables


def test_orbax_roundtrip(tmp_path, model_and_vars):
    cfg, model, _ = model_and_vars
    state = create_train_state(model, cfg, jax.random.key(0))
    path = checkpoint.save(str(tmp_path / "ckpt"), state, 7)
    assert os.path.exists(path)
    # perturb, then restore
    import dataclasses

    zeroed = dataclasses.replace(
        state,
        params=jax.tree.map(jnp.zeros_like, state.params),
        step=jnp.asarray(0, jnp.int32),
    )
    restored = checkpoint.restore(str(tmp_path / "ckpt"), zeroed)
    assert int(restored.step) == 0 or int(restored.step) == int(state.step)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not os.path.exists(REF_CKPT + ".index"),
                    reason="reference checkpoint absent")
def test_name_mapping_covers_shipped_checkpoint(model_and_vars):
    """Every flax param/stat maps to a variable present in the real
    checkpoint with the matching shape."""
    tf = pytest.importorskip("tensorflow")
    _, _, variables = model_and_vars
    shipped = {name: shape for name, shape in tf.train.list_variables(REF_CKPT)}
    available = set(shipped)

    unmapped = []
    for tree in (variables["params"], variables["batch_stats"]):
        for path, leaf in flax_paths(tree):
            tf_name = checkpoint.tf_variable_name(path, available)
            if tf_name is None or tf_name not in shipped:
                unmapped.append("/".join(path))
                continue
            tf_shape = shipped[tf_name]
            if len(tf_shape) == 4:
                tf_shape = tf_shape[-2:]
            assert tuple(tf_shape) == tuple(leaf.shape), (
                f"{'/'.join(path)} -> {tf_name}: {tf_shape} vs {leaf.shape}"
            )
    assert unmapped == [], f"unmapped flax variables: {unmapped}"


def test_import_tf_checkpoint_values(model_and_vars):
    """Round-trip: synthesize a TF variable table with the reference naming
    (including the run-scope EMA names) and import it."""
    _, _, variables = model_and_vars
    rng = np.random.default_rng(0)
    tf_vars = {}
    for tree in (variables["params"], variables["batch_stats"]):
        for path, leaf in flax_paths(tree):
            name = checkpoint.tf_variable_name(path)  # canonical suffix form
            assert name is not None, path
            # emulate the shipped naming with an outer scope on EMA vars
            if name.endswith("ExponentialMovingAverage"):
                scope = name.split("/bn/")[0]
                name = name.replace(
                    f"{scope}/bn/", f"{scope}/bn/6d_pose/{scope}/bn/"
                )
            shape = leaf.shape
            if name.endswith("/weights") and len(shape) == 2 and (
                "dgcnn" in name and "fc" not in name and "output" not in name
            ):
                shape = (1, 1, *shape)  # conv kernels are (1,1,in,out) in TF
            tf_vars[name] = rng.normal(size=shape).astype(np.float32)

    params, stats, missing = checkpoint.import_tf_checkpoint(
        tf_vars, variables["params"], variables["batch_stats"]
    )
    assert missing == []
    # spot-check a conv kernel (squeezed) and an EMA stat
    w = np.asarray(params["encoder"]["dgcnn1"]["conv"]["dense"]["kernel"])
    src = [v for k, v in tf_vars.items() if k == "dgcnn1/weights"][0]
    assert np.allclose(w, src.reshape(48, 64))
    m = np.asarray(stats["encoder"]["dgcnn1"]["conv"]["bn"]["mean"])
    src_m = [v for k, v in tf_vars.items() if "dgcnn1/bn" in k and k.endswith(
        "moments/Squeeze/ExponentialMovingAverage")][0]
    assert np.allclose(m, src_m)


def test_export_params_roundtrip_and_predictor(tmp_path, model_and_vars):
    """export_params -> load_params is exact, and Predictor.from_params
    predicts identically to Predictor.from_state."""
    cfg, model, _ = model_and_vars
    state = create_train_state(model, cfg, jax.random.key(1))
    out = checkpoint.export_params(state, str(tmp_path / "deploy"))
    assert out.endswith(".npz") and os.path.exists(out)

    params, batch_stats, step = checkpoint.load_params(out)
    assert step == int(state.step)
    for want_tree, got_tree in (
        (state.params, params), (state.batch_stats, batch_stats)
    ):
        want = dict(flax_paths(jax.device_get(want_tree)))
        got = dict(flax_paths(got_tree))
        assert set(want) == set(got)
        for path in want:
            assert np.array_equal(
                np.asarray(want[path]), np.asarray(got[path])
            ), path

    from cloudaae_tpu.infer import Predictor

    a = Predictor.from_state(state, cfg)
    b = Predictor.from_params(out, cfg)
    rng = np.random.default_rng(3)
    segs = (rng.normal(size=(2, 256, 3)) * 0.05).astype(np.float32)
    segs[..., 2] += 0.7
    cls = np.array([0, 5], np.int32)
    Ra, ta = a(segs, cls)
    Rb, tb = b(segs, cls)
    assert np.array_equal(np.asarray(Ra), np.asarray(Rb))
    assert np.array_equal(np.asarray(ta), np.asarray(tb))


def test_restore_any_dispatch(tmp_path, model_and_vars):
    """restore_any: npz file, run dir holding params_latest.npz, and a
    plain orbax dir all restore params/batch_stats/step identically."""
    cfg, model, _ = model_and_vars
    state = create_train_state(model, cfg, jax.random.key(2))
    fresh = create_train_state(model, cfg, jax.random.key(3))

    run_dir = tmp_path / "run"
    os.makedirs(run_dir)
    npz = checkpoint.export_params(state, str(run_dir / "params_latest"))
    ckpt_dir = tmp_path / "ckpt"
    checkpoint.save(str(ckpt_dir), state, 7)

    for src in (npz, str(run_dir), str(ckpt_dir)):
        got = checkpoint.restore_any(src, fresh)
        for attr in ("params", "batch_stats"):
            want = dict(flax_paths(jax.device_get(getattr(state, attr))))
            have = dict(flax_paths(jax.device_get(getattr(got, attr))))
            assert set(want) == set(have)
            for path in want:
                assert np.array_equal(
                    np.asarray(want[path]), np.asarray(have[path])
                ), (src, attr, path)
        assert int(got.step) == int(state.step), src


def test_restore_any_prefers_orbax_over_npz(tmp_path, model_and_vars):
    """A run dir holding BOTH <run>/ckpt (orbax) and params_latest.npz must
    restore the full orbax TrainState (opt_state intact) — the npz is only
    the survival fallback (ADVICE round 2, checkpoint.py:73)."""
    import dataclasses

    cfg, model, _ = model_and_vars
    state_a = create_train_state(model, cfg, jax.random.key(4))
    state_b = create_train_state(model, cfg, jax.random.key(5))
    fresh = create_train_state(model, cfg, jax.random.key(6))

    run_dir = tmp_path / "run"
    os.makedirs(run_dir)
    checkpoint.save(str(run_dir / "ckpt"), state_a, 11)
    checkpoint.export_params(
        dataclasses.replace(state_b, step=jnp.asarray(99, jnp.int32)),
        str(run_dir / "params_latest"),
    )

    got = checkpoint.restore_any(str(run_dir), fresh)
    a0 = np.asarray(jax.tree.leaves(jax.device_get(state_a.params))[0])
    g0 = np.asarray(jax.tree.leaves(jax.device_get(got.params))[0])
    assert np.array_equal(a0, g0)  # orbax (state_a) won, not the npz
    assert int(got.step) == int(state_a.step)


def test_restore_any_npz_step_mismatch_raises(tmp_path, model_and_vars):
    """Requesting a specific step from an npz that holds a different step
    must fail loudly (ADVICE round 2, checkpoint.py:60)."""
    cfg, model, _ = model_and_vars
    state = create_train_state(model, cfg, jax.random.key(7))
    npz = checkpoint.export_params(state, str(tmp_path / "params"))
    with pytest.raises(ValueError, match="requested step"):
        checkpoint.restore_any(npz, state, step=int(state.step) + 123)


def test_export_params_is_atomic(tmp_path, model_and_vars):
    """export_params leaves no .tmp sibling and overwrites in place."""
    cfg, model, _ = model_and_vars
    state = create_train_state(model, cfg, jax.random.key(8))
    out = checkpoint.export_params(state, str(tmp_path / "params_latest"))
    out2 = checkpoint.export_params(state, out)  # overwrite path ends in .npz
    assert out == out2
    leftovers = [f for f in os.listdir(tmp_path) if ".tmp" in f]
    assert leftovers == []
    params, _, step = checkpoint.load_params(out)
    assert step == int(state.step) and params
