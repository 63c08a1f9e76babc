"""Model-zoo tests: shapes, parameter counts, BN semantics, train flags.

The key fixture is the checkpoint shape audit (SURVEY.md §2.5): the shipped
TF checkpoint for get_model_dgcnn_mean_6d has ~6.94 M parameters with
dgcnn1 48->64 ... dgcnn_agg 320->1024, decoder out 1024->3072 — our flax
model must land on exactly those shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cloudaae_tpu.config import ModelConfig
from cloudaae_tpu.models import CloudAAE, make_model


B, N, NUM_CLASS = 4, 256, 21


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.05
    onehot = np.zeros((B, N, NUM_CLASS), np.float32)
    onehot[:, :, 3] = 1.0
    return jnp.asarray(np.concatenate([xyz, onehot], axis=-1))


def init_model(model, inputs, rngs=None):
    rngs = rngs or {"params": jax.random.key(0)}
    return model.init(rngs, inputs, train_encoder=False, train_heads=False)


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_production_model_shapes_and_param_count(inputs):
    model = make_model(name="dgcnn_mean_6d")
    variables = init_model(model, inputs)
    recon, rot, trans, ep = model.apply(variables, inputs)
    assert recon.shape == (B, N * 4, 3)
    assert rot.shape == (B, 3)
    assert trans.shape == (B, 3)
    assert ep["embedding"].shape == (B, 1024)

    n_params = count_params(variables["params"])
    # checkpoint audit: ~6.94M trainable parameters
    assert 6.8e6 < n_params < 7.1e6, f"{n_params}"

    p = variables["params"]
    assert p["encoder"]["dgcnn1"]["conv"]["dense"]["kernel"].shape == (48, 64)
    assert p["encoder"]["dgcnn4"]["conv"]["dense"]["kernel"].shape == (128, 128)
    assert p["encoder"]["dgcnn_agg"]["dense"]["kernel"].shape == (320, 1024)
    assert p["decoder"]["fc_out"]["dense"]["kernel"].shape == (1024, 3072)
    assert p["rot_head"]["fc1"]["dense"]["kernel"].shape == (1024, 512)


@pytest.mark.parametrize(
    "name,recon_shape,has_heads",
    [
        ("pn_6d", (B, N * 4, 3), True),
        ("dgcnn_ae_max", (B, N * 4, 3), False),
        ("dgcnn_ae_mean", (B, N * 4, 3), False),
        ("dgcnn_mean_6d_hand", (B, N, 5), True),
        ("dgcnn_max_6d", (B, N * 4, 3), True),
    ],
)
def test_zoo_variants(inputs, name, recon_shape, has_heads):
    model = make_model(name=name)
    variables = init_model(model, inputs)
    recon, rot, trans, _ = model.apply(variables, inputs)
    assert recon.shape == recon_shape
    assert (rot is not None) == has_heads


def test_vae_variant(inputs):
    model = make_model(name="dgcnn_mean_vae")
    rngs = {"params": jax.random.key(0), "vae": jax.random.key(1)}
    variables = model.init(rngs, inputs, train_encoder=False, train_heads=False)
    recon, _, _, ep = model.apply(
        variables, inputs, rngs={"vae": jax.random.key(2)}
    )
    assert recon.shape == (B, N * 4, 3)
    assert ep["z_mean"].shape == (B, 1024)
    # relu-clamped std, as in the reference (:136-142)
    assert float(jnp.min(ep["z_std"])) >= 0.0
    # different vae rng -> different reconstruction
    recon2, _, _, _ = model.apply(variables, inputs, rngs={"vae": jax.random.key(3)})
    assert not np.allclose(np.asarray(recon), np.asarray(recon2))


def test_bn_ema_update_semantics(inputs):
    model = make_model(name="dgcnn_mean_6d")
    variables = init_model(model, inputs)
    stats0 = variables["batch_stats"]

    # train step with mutable stats: EMA moves toward batch moments
    (_, _, _, _), updates = model.apply(
        variables,
        inputs,
        train_encoder=True,
        train_heads=True,
        momentum=0.5,
        mutable=["batch_stats"],
    )
    stats1 = updates["batch_stats"]
    m0 = stats0["encoder"]["dgcnn1"]["conv"]["bn"]["mean"]
    m1 = stats1["encoder"]["dgcnn1"]["conv"]["bn"]["mean"]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))

    # eval without mutable: uses running stats, deterministic
    out_a = model.apply(variables, inputs)[0]
    out_b = model.apply(variables, inputs)[0]
    assert np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_frozen_encoder_flag_changes_bn_mode(inputs):
    """train_encoder=False must make encoder BN use running stats even while
    heads train — the frozen-encoder finetune mode."""
    model = make_model(name="dgcnn_mean_6d")
    variables = init_model(model, inputs)
    (_, _, _, _), updates = model.apply(
        variables,
        inputs,
        train_encoder=False,
        train_heads=True,
        momentum=0.5,
        mutable=["batch_stats"],
    )
    m0 = variables["batch_stats"]["encoder"]["dgcnn1"]["conv"]["bn"]["mean"]
    m1 = updates["batch_stats"]["encoder"]["dgcnn1"]["conv"]["bn"]["mean"]
    assert np.allclose(np.asarray(m0), np.asarray(m1))  # encoder stats frozen
    d0 = variables["batch_stats"]["decoder"]["fc1"]["bn"]["mean"]
    d1 = updates["batch_stats"]["decoder"]["fc1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))  # heads update


def test_model_jit_and_grad(inputs):
    model = make_model(name="dgcnn_mean_6d")
    variables = init_model(model, inputs)

    @jax.jit
    def loss_fn(params):
        recon, rot, trans, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, inputs
        )
        return jnp.sum(recon**2) + jnp.sum(rot**2) + jnp.sum(trans**2)

    g = jax.grad(loss_fn)(variables["params"])
    gnorm = jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(g))
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_split_edge_conv_matches_naive_formulation(inputs):
    """The split-linear edge conv must equal conv(concat(c, n-c)) exactly."""
    from cloudaae_tpu.ops.knn import edge_feature, knn_indices, pairwise_sq_dist

    model = make_model(name="dgcnn_mean_6d")
    variables = init_model(model, inputs)
    p = variables["params"]["encoder"]["dgcnn1"]["conv"]["dense"]
    kernel, bias = np.asarray(p["kernel"]), np.asarray(p["bias"])

    x = np.asarray(inputs)  # (B, N, 24)
    idx = np.asarray(knn_indices(pairwise_sq_dist(jnp.asarray(x)), 10))
    ef = np.asarray(edge_feature(jnp.asarray(x), jnp.asarray(idx)))  # (B,N,k,48)
    naive = ef @ kernel + bias

    c = x.shape[-1]
    a = x @ kernel[:c] + bias
    v = x @ kernel[c:]
    B, N, k = idx.shape
    v_nbr = np.stack([v[b][idx[b].reshape(-1)].reshape(N, k, -1) for b in range(B)])
    split = a[:, :, None, :] + v_nbr - v[:, :, None, :]
    assert np.max(np.abs(naive - split)) < 1e-5


def test_one_hot_matmul_gather_matches_row_gather():
    """The TPU edge-conv neighbor path (one-hot matmul on the MXU) must be an
    exact selection — identical values to the row gather, any dtype."""
    import numpy as np

    from cloudaae_tpu.models.dgcnn import _gather_neighbors_matmul
    from cloudaae_tpu.ops.knn import gather_rows

    rng = np.random.default_rng(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        v = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32)).astype(dtype)
        idx = jnp.asarray(rng.integers(0, 64, size=(2, 64, 5)).astype(np.int32))
        got = _gather_neighbors_matmul(v, idx)
        want = gather_rows(v, idx.reshape(2, 64 * 5)).reshape(2, 64, 5, 16)
        assert got.dtype == want.dtype
        assert bool(jnp.all(got == want)), dtype
