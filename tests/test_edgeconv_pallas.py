"""Fused Pallas edge-conv parity vs the jnp/XLA formulation.

Pattern follows tests/test_hpr.py's Pallas-vs-jnp parity gates: on the CPU
test mesh the kernels run in interpret mode, so numerics (not Mosaic
codegen) are what's validated here; the real-TPU loss-trajectory gate
lives in the bench/verify flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudaae_tpu.ops.edgeconv_pallas import (
    edge_conv_mean,
    edge_conv_mean_reference,
    edge_conv_moments,
)
from cloudaae_tpu.ops.knn import knn_indices, pairwise_sq_dist


@pytest.fixture
def case():
    rng = np.random.default_rng(0)
    b, n, c, f, k = 3, 64, 24, 32, 10
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32) * 0.3)
    kernel = jnp.asarray(rng.normal(size=(2 * c, f)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(f,)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(f,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(f,)).astype(np.float32) * 0.1)
    idx = knn_indices(pairwise_sq_dist(x), k)
    return x, kernel, bias, scale, shift, idx


def test_mean_forward_parity(case):
    x, kernel, bias, scale, shift, idx = case
    got = edge_conv_mean(x, kernel, bias, scale, shift, idx)
    want = edge_conv_mean_reference(x, kernel, bias, scale, shift, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mean_forward_parity_bf16(case):
    x, kernel, bias, scale, shift, idx = case
    got = edge_conv_mean(x, kernel, bias, scale, shift, idx, "bfloat16")
    want = edge_conv_mean_reference(x, kernel, bias, scale, shift, idx,
                                    "bfloat16")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_moments_parity(case):
    x, kernel, bias, _, _, idx = case
    s1, s2 = edge_conv_moments(x, kernel, bias, idx)
    c = x.shape[-1]
    a = x @ kernel[:c] + bias
    v = x @ kernel[c:]
    nbr = jax.vmap(lambda vb, ib: vb[ib])(v, idx)
    pre = a[:, :, None, :] + nbr - v[:, :, None, :]
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(jnp.sum(pre, axis=(1, 2))),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(jnp.sum(pre * pre, axis=(1, 2))),
        rtol=1e-4, atol=1e-4,
    )


def test_mean_gradients_match_reference(case):
    x, kernel, bias, scale, shift, idx = case
    rng = np.random.default_rng(1)
    cot = jnp.asarray(
        rng.normal(size=(x.shape[0], x.shape[1], kernel.shape[-1]))
        .astype(np.float32)
    )

    def loss_fused(x, kernel, bias, scale, shift):
        return jnp.sum(edge_conv_mean(x, kernel, bias, scale, shift, idx)
                       * cot)

    def loss_ref(x, kernel, bias, scale, shift):
        return jnp.sum(
            edge_conv_mean_reference(x, kernel, bias, scale, shift, idx)
            * cot
        )

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, kernel, bias, scale, shift
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, kernel, bias, scale, shift
    )
    for name, gf, gr in zip(("x", "kernel", "bias", "scale", "shift"),
                            g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_moments_gradients_match_reference(case):
    x, kernel, bias, _, _, idx = case
    c = x.shape[-1]

    def loss_fused(x, kernel, bias):
        s1, s2 = edge_conv_moments(x, kernel, bias, idx)
        return jnp.sum(s1 * 0.3) + jnp.sum(s2 * 0.7)

    def loss_ref(x, kernel, bias):
        a = x @ kernel[:c] + bias
        v = x @ kernel[c:]
        nbr = jax.vmap(lambda vb, ib: vb[ib])(v, idx)
        pre = a[:, :, None, :] + nbr - v[:, :, None, :]
        return (jnp.sum(jnp.sum(pre, axis=(1, 2)) * 0.3)
                + jnp.sum(jnp.sum(pre * pre, axis=(1, 2)) * 0.7))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, kernel, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kernel, bias)
    for name, gf, gr in zip(("x", "kernel", "bias"), g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_fused_model_matches_xla_path():
    """CloudAAE(edgeconv_fused=True) == CloudAAE(edgeconv_fused=False):
    same parameter tree, same forward outputs, same train-mode batch_stats
    updates — the fused path is an implementation, not an architecture."""
    import dataclasses

    from cloudaae_tpu.config import ModelConfig
    from cloudaae_tpu.models import make_model

    cfg = ModelConfig(num_point=64, num_class=5, compute_dtype="float32",
                      knn_approx_recall=None)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 8)).astype(np.float32) * 0.2)

    m_x = make_model(dataclasses.replace(cfg, edgeconv_fused=False))
    m_f = make_model(dataclasses.replace(cfg, edgeconv_fused=True))
    v_x = m_x.init(jax.random.key(0), x)
    v_f = m_f.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(v_x) == jax.tree_util.tree_structure(
        v_f
    )

    # eval forward parity (uses the same params)
    rx = m_x.apply(v_x, x)
    rf = m_f.apply(v_x, x)
    for ox, of in zip(rx[:3], rf[:3]):
        np.testing.assert_allclose(np.asarray(ox), np.asarray(of),
                                   rtol=2e-4, atol=2e-4)

    # train forward + batch_stats parity
    (rx, sx) = m_x.apply(v_x, x, train_encoder=True, train_heads=True,
                         momentum=0.9, mutable=["batch_stats"])
    (rf, sf) = m_f.apply(v_x, x, train_encoder=True, train_heads=True,
                         momentum=0.9, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(rx[0]), np.asarray(rf[0]),
                               rtol=2e-4, atol=2e-4)
    for (px, lx), (pf, lf) in zip(
        jax.tree_util.tree_leaves_with_path(sx),
        jax.tree_util.tree_leaves_with_path(sf),
    ):
        assert px == pf
        np.testing.assert_allclose(np.asarray(lx), np.asarray(lf),
                                   rtol=2e-4, atol=2e-4, err_msg=str(px))

    # gradient parity through the full model (the BN-through-moments chain)
    def loss_of(m):
        def fn(params):
            variables = {"params": params,
                         "batch_stats": v_x["batch_stats"]}
            (recon, rot, trans, _), _ = m.apply(
                variables, x, train_encoder=True, train_heads=True,
                momentum=0.9, mutable=["batch_stats"],
            )
            return (jnp.mean(jnp.square(recon)) + jnp.mean(jnp.square(rot))
                    + jnp.mean(jnp.square(trans)))
        return fn

    gx = jax.grad(loss_of(m_x))(v_x["params"])
    gf = jax.grad(loss_of(m_f))(v_x["params"])
    for (px, lx), (pf, lf) in zip(
        jax.tree_util.tree_leaves_with_path(gx),
        jax.tree_util.tree_leaves_with_path(gf),
    ):
        assert px == pf
        np.testing.assert_allclose(np.asarray(lx), np.asarray(lf),
                                   rtol=5e-3, atol=5e-4, err_msg=str(px))


def test_fused_model_under_vmap():
    """The eval path vmaps model.apply over frames — the fused op must
    batch correctly (pallas_call's vmap rule adds a grid dim)."""
    import dataclasses

    from cloudaae_tpu.config import ModelConfig
    from cloudaae_tpu.models import make_model

    cfg = ModelConfig(num_point=32, num_class=4, compute_dtype="float32",
                      knn_approx_recall=None)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(3, 1, 32, 7)).astype(np.float32) * 0.2)

    m_f = make_model(dataclasses.replace(cfg, edgeconv_fused=True))
    m_x = make_model(dataclasses.replace(cfg, edgeconv_fused=False))
    v = m_f.init(jax.random.key(1), x[0])

    rf = jax.vmap(lambda xi: m_f.apply(v, xi)[0])(x)
    rx = jax.vmap(lambda xi: m_x.apply(v, xi)[0])(x)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(rx),
                               rtol=2e-4, atol=2e-4)
