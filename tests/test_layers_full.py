"""The full tf_util layer surface built natively (VERDICT r2 missing #3):
conv1d/2d/3d, conv2d_transpose, max/avg pools, dropout — reference
contracts from utils/tf_util.py:53-594.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudaae_tpu.models import (
    ConvND, ConvTranspose2D, Dropout, avg_pool, max_pool,
)


@pytest.mark.parametrize("nd,spatial", [(1, (16,)), (2, (8, 8)),
                                        (3, (4, 4, 4))])
def test_convnd_shapes_and_bn(nd, spatial):
    rng = np.random.default_rng(nd)
    x = jnp.asarray(rng.normal(size=(2, *spatial, 5)).astype(np.float32))
    m = ConvND(7, kernel_size=(3,) * nd, padding="SAME")
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, *spatial, 7)
    assert float(jnp.min(y)) >= 0.0  # relu default

    # train mode folds batch moments into the EMA running stats
    y2, upd = m.apply(v, x, train=True, momentum=0.5,
                      mutable=["batch_stats"])
    bn = upd["batch_stats"]["bn"]
    assert not np.allclose(np.asarray(bn["mean"]), 0.0)
    assert y2.shape == y.shape

    # VALID padding shrinks the spatial dims
    m_v = ConvND(7, kernel_size=(3,) * nd, padding="VALID")
    v_v = m_v.init(jax.random.key(0), x)
    y_v = m_v.apply(v_v, x)
    assert y_v.shape == (2, *(s - 2 for s in spatial), 7)


def test_conv1x1_matches_dense_math():
    """A 1x1 ConvND is exactly a Dense over channels (the identity the
    whole model zoo is built on, models/__init__.py docstring)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    m = ConvND(6, kernel_size=(1,), use_bn=False, activation=None)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    w = v["params"]["kernel"].reshape(4, 6)
    want = x @ w + v["params"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_conv_transpose_roundtrip_shape():
    """tf_util.conv2d_transpose:214 contract: conv2d(conv2d_transpose(a))
    with the same stride restores a's spatial shape (SAME padding)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 3)).astype(np.float32))
    up = ConvTranspose2D(8, kernel_size=(3, 3), strides=(2, 2),
                         use_bn=False, activation=None)
    v_up = up.init(jax.random.key(0), x)
    y = up.apply(v_up, x)
    assert y.shape == (2, 12, 12, 8)
    down = ConvND(3, kernel_size=(3, 3), strides=(2, 2), use_bn=False,
                  activation=None)
    v_dn = down.init(jax.random.key(1), y)
    z = down.apply(v_dn, y)
    assert z.shape == x.shape


def test_pools_match_numpy_oracle():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    got_max = np.asarray(max_pool(jnp.asarray(x), (2, 2)))
    got_avg = np.asarray(avg_pool(jnp.asarray(x), (2, 2)))
    want_max = x.reshape(1, 2, 2, 2, 2, 2).max(axis=(2, 4))
    want_avg = x.reshape(1, 2, 2, 2, 2, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(got_max, want_max, rtol=1e-6)
    np.testing.assert_allclose(got_avg, want_avg, rtol=1e-6)

    # 3-D pools
    x3 = rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32)
    got3 = np.asarray(max_pool(jnp.asarray(x3), (2, 2, 2)))
    assert got3.shape == (1, 2, 2, 2, 2)


def test_dropout_tf_semantics():
    """keep_prob convention, 1/keep_prob scaling at train, identity at
    eval (tf_util.dropout :573-594)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32)) + 5.0
    m = Dropout(keep_prob=0.5)
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               x, train=True)
    y_eval = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))

    y_tr = m.apply(v, x, train=True, rngs={"dropout": jax.random.key(2)})
    kept = np.asarray(y_tr) != 0.0
    assert 0.3 < kept.mean() < 0.7
    np.testing.assert_allclose(
        np.asarray(y_tr)[kept], np.asarray(x)[kept] / 0.5, rtol=1e-6
    )
