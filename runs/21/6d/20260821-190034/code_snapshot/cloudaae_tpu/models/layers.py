"""Layer library: Dense blocks with TF-style EMA batch norm.

Replaces ``utils/tf_util.py:53-594``.  Differences from stock flax that the
reference semantics require:

  * Batch-norm decay is a *runtime scalar* following the staircase schedule
    ``min(0.99, 1 - 0.5*0.5**(step*B/40))`` (train_cloudAAE_ycbv.py:166-202),
    so the momentum is an argument, not a module attribute.
  * Normalization statistics reduce over every axis except channels, and the
    EMA update is ``running = decay*running + (1-decay)*batch`` — exactly
    ``tf.train.ExponentialMovingAverage`` in ``batch_norm_template``
    (utils/tf_util.py:473-511).
  * Weight init is xavier/glorot-uniform with zero biases
    (utils/tf_util.py:25-50), so a freshly initialized network matches the
    reference's init distribution.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


class EmaBatchNorm(nn.Module):
    """TF-semantics batch norm with dynamic EMA decay.

    ``train=True``: normalize by batch moments and (when the 'batch_stats'
    collection is mutable) fold them into the running EMA with the given
    decay.  ``train=False``: normalize by the running statistics.  Matches
    ``batch_norm_template`` (utils/tf_util.py:473-511) including biased
    batch variance (``tf.nn.moments``).
    """

    epsilon: float = 1e-3  # tf_util.batch_norm_template:508 uses 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, momentum) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x), axis=axes) - jnp.square(mean)
            # EMA fold-in only when batch_stats is mutable (the train step)
            if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"
            ):
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        return (x - mean) * (inv * scale) + bias


class EmaBatchNormAffine(nn.Module):
    """EmaBatchNorm with externally computed batch moments.

    Parameter/variable tree is IDENTICAL to :class:`EmaBatchNorm` (scale,
    bias params; batch_stats mean/var), so checkpoints are interchangeable
    between the two.  Used by fused kernels (ops.edgeconv_pallas) that
    reduce the batch statistics themselves: instead of normalizing a
    materialized tensor, it returns the folded per-channel affine
    ``(gamma/sqrt(var+eps), beta - mean*that)`` and performs the same EMA
    fold-in as EmaBatchNorm.

    ``batch_mean``/``batch_var`` may be None when ``train=False`` (running
    statistics are used, as in EmaBatchNorm's eval branch).
    """

    features: int
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, batch_mean, batch_var, train: bool, momentum):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if train:
            mean, var = batch_mean, batch_var
            if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"
            ):
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        eff_scale = inv * scale
        return eff_scale, bias - mean * eff_scale


class Dense(nn.Module):
    """Dense + optional EMA-BN + activation.

    Covers both the reference's ``fully_connected`` (utils/tf_util.py:321)
    and its 1x1 ``conv2d`` (utils/tf_util.py:111) — on (B, N, k, C) inputs a
    1x1 conv *is* a Dense over the channel axis, and XLA maps either onto
    the same MXU matmul.
    """

    features: int
    use_bn: bool = True
    activation: Callable | None = nn.relu
    dtype: jnp.dtype | None = None  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, momentum=0.9):
        x = nn.Dense(
            self.features,
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )(x)
        if self.use_bn:
            # normalize in f32: EMA statistics and the 1/sqrt(var) path are
            # precision-sensitive
            x = EmaBatchNorm(name="bn")(
                x.astype(jnp.float32), train=train, momentum=momentum
            )
            if self.dtype is not None:
                x = x.astype(self.dtype)
        if self.activation is not None:
            x = self.activation(x)
        return x


_CONV_DIMS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


class ConvND(nn.Module):
    """1/2/3-D convolution + optional EMA-BN + activation, channels-last.

    The native construction of ``tf_util.conv1d/conv2d/conv3d``
    (utils/tf_util.py:53-365): xavier kernel, zero bias, the same
    runtime-decay EMA batch norm, relu default.  No reference model uses
    strides/padding beyond the defaults in anger, but the full surface is
    here (kernel_size/strides tuples, SAME/VALID).
    """

    features: int
    kernel_size: tuple[int, ...] = (1, 1)
    strides: tuple[int, ...] | None = None
    padding: str = "SAME"
    use_bn: bool = True
    activation: Callable | None = nn.relu
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, momentum=0.9):
        from jax import lax

        nd = len(self.kernel_size)
        kshape = (*self.kernel_size, x.shape[-1], self.features)
        kernel = self.param("kernel", nn.initializers.glorot_uniform(), kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x, kernel, bias = (a.astype(self.dtype) for a in (x, kernel, bias))
        dn = lax.conv_dimension_numbers(x.shape, kshape, _CONV_DIMS[nd])
        x = lax.conv_general_dilated(
            x, kernel, self.strides or (1,) * nd, self.padding,
            dimension_numbers=dn,
        ) + bias
        if self.use_bn:
            x = EmaBatchNorm(name="bn")(
                x.astype(jnp.float32), train=train, momentum=momentum
            )
            if self.dtype is not None:
                x = x.astype(self.dtype)
        if self.activation is not None:
            x = self.activation(x)
        return x


class ConvTranspose2D(nn.Module):
    """2-D transposed convolution + optional EMA-BN + activation.

    ``tf_util.conv2d_transpose`` (utils/tf_util.py:182-259), including its
    documented contract that conv2d(conv2d_transpose(a)) restores a's
    spatial shape for SAME padding.
    """

    features: int
    kernel_size: tuple[int, int] = (1, 1)
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bn: bool = True
    activation: Callable | None = nn.relu
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, momentum=0.9):
        from jax import lax

        kshape = (*self.kernel_size, x.shape[-1], self.features)
        kernel = self.param("kernel", nn.initializers.glorot_uniform(), kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x, kernel, bias = (a.astype(self.dtype) for a in (x, kernel, bias))
        x = lax.conv_transpose(
            x, kernel, self.strides, self.padding,
            dimension_numbers=_CONV_DIMS[2],
        ) + bias
        if self.use_bn:
            x = EmaBatchNorm(name="bn")(
                x.astype(jnp.float32), train=train, momentum=momentum
            )
            if self.dtype is not None:
                x = x.astype(self.dtype)
        if self.activation is not None:
            x = self.activation(x)
        return x


def max_pool(x: jnp.ndarray, window: tuple[int, ...],
             strides: tuple[int, ...] | None = None,
             padding: str = "VALID") -> jnp.ndarray:
    """Spatial max pool over the middle dims of a channels-last tensor
    (tf_util.max_pool2d/3d, utils/tf_util.py:368-392,419-443)."""
    from jax import lax

    strides = strides or window
    full_w = (1, *window, 1)
    full_s = (1, *strides, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, full_w, full_s, padding)


def avg_pool(x: jnp.ndarray, window: tuple[int, ...],
             strides: tuple[int, ...] | None = None,
             padding: str = "VALID") -> jnp.ndarray:
    """Spatial average pool (tf_util.avg_pool2d/3d,
    utils/tf_util.py:393-418,444-467)."""
    from jax import lax

    strides = strides or window
    full_w = (1, *window, 1)
    full_s = (1, *strides, 1)
    summed = lax.reduce_window(x, 0.0, lax.add, full_w, full_s, padding)
    import numpy as np

    return summed / float(np.prod(window))


class Dropout(nn.Module):
    """Inverted dropout with TF semantics: keep_prob, scale by 1/keep_prob
    at train time, identity at eval (tf_util.dropout,
    utils/tf_util.py:573-594 — appears only commented-out in the reference
    models, models/pointnet_ycb_23_decoder_4.py:199)."""

    keep_prob: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if not train or self.keep_prob >= 1.0:
            return x
        import jax

        keep = jax.random.bernoulli(
            self.make_rng("dropout"), self.keep_prob, x.shape
        )
        return jnp.where(keep, x / self.keep_prob, 0.0)


class PointMLP(nn.Module):
    """A stack of Dense(+BN+ReLU) blocks applied pointwise."""

    features: tuple[int, ...]
    use_bn: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, momentum=0.9):
        for i, f in enumerate(self.features):
            x = Dense(f, use_bn=self.use_bn, dtype=self.dtype, name=f"mlp{i+1}")(
                x, train=train, momentum=momentum
            )
        return x
