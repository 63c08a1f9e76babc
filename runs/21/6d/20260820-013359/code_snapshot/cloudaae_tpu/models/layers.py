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
