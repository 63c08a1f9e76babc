"""The CloudAAE model zoo: DGCNN/PointNet encoders, FC decoder, pose heads.

One configurable flax module covers all seven architectures of
``models/pointnet_ycb_23_decoder_4.py``:

  reference builder (file:line)              config
  -----------------------------------------  --------------------------------
  get_model_pn                :23            encoder='pointnet', with_heads
  get_model_dgcnn             :93            encoder='dgcnn', aggregation='max',
                                             with_heads=False
  get_model_dgcnn_mean        :210           aggregation='mean', with_heads=False
  get_model_dgcnn_mean_6d     :327           DEFAULT (production model)
  get_model_dgcnn_mean_6d_hand:458           recon_channels=5, recon_multiplier=1
  get_model_dgcnn_max_6d      :592           aggregation='max'
  get_model_dgcnn_mean_6d_2   :726           same net, second instance (name it)
  get_model_dgcnn_mean_vae    :859           vae=True, with_heads=False

Architecture of the production model (checkpoint shape audit, SURVEY.md §2.5):
4 EdgeConv blocks (64, 64, 64, 128) with kNN recomputed per block from the
first 3 channels of the current features and *mean* aggregation over the k
neighbors; 1x1 conv to 1024 over the concatenated block outputs (320ch);
mean over points -> 1024-D embedding; FC decoder 1024-1024-(N*3*4); two FC
heads 1024-512-256-3 for axis-angle rotation and translation residual.

The dual train flags reproduce the reference's separate
``is_training_pl_encoder`` / ``is_training`` placeholders
(models/pointnet_ycb_23_decoder_4.py:327) used for frozen-encoder finetuning
(trained_network/.../train_6d_...compact.py:372-409).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from cloudaae_tpu.config import ModelConfig
from cloudaae_tpu.models.layers import Dense, EmaBatchNorm, EmaBatchNormAffine
from cloudaae_tpu.ops.knn import gather_rows, knn_indices, pairwise_sq_dist


def _dtype_of(cfg: ModelConfig):
    return None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype)


class _SplitEdgeKernel(nn.Module):
    """The edge-conv weight (2C -> F), applied in split form.

    ``conv(concat(c, n - c)) = c @ W_c + (n - c) @ W_n + b``, so per-POINT
    products ``a = x @ W_c + b`` and ``v = x @ W_n`` followed by a neighbor
    gather of ``v`` reproduce the per-EDGE conv exactly with k-fold fewer
    MACs (k = neighbors) than a matmul over materialized (B,N,k,2C) edge
    features.  Parameter tree (kernel (2C, F), bias (F,)) matches the naive
    formulation and the TF checkpoint mapping.
    """

    features: int
    dtype: jnp.dtype | None = None
    raw: bool = False  # return (kernel, bias) for fused kernels

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (2 * c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.raw:
            return kernel, bias
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        a = x @ kernel[:c] + bias     # center term (+ bias once)
        v = x @ kernel[c:]            # neighbor-difference term
        return a, v


def _gather_neighbors_matmul(v: jnp.ndarray, nn_idx: jnp.ndarray) -> jnp.ndarray:
    """Neighbor gather as a one-hot matmul: (..., N, F), (..., N, k) -> (..., N, k, F).

    On TPU a (B*N*k)-row gather and — far worse — its backward scatter-add
    dominate the edge-conv blocks (measured 8.7 + 18.9 ms of a 90 ms step).
    ``one_hot(idx) @ v`` computes the identical selection on the MXU
    (products are v*1 or v*0 — exact in any dtype), and its VJP is another
    matmul ``one_hot^T @ g`` instead of a scatter.  Replaces the data
    movement of the reference's flat ``tf.gather`` edge features
    (utils/tf_util.py:658-662) with MXU work.
    """
    *batch, n, k = nn_idx.shape
    oh = jax.nn.one_hot(nn_idx.reshape(*batch, n * k), n, dtype=v.dtype)
    v_nbr = jnp.matmul(oh, v)
    return v_nbr.reshape(*batch, n, k, v.shape[-1])


class _EdgeConv(nn.Module):
    """Split edge kernel + EMA-BN; parameter paths conv/dense/*, conv/bn/*."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, nn_idx, train: bool, momentum):
        a, v = _SplitEdgeKernel(self.features, self.dtype, name="dense")(x)
        *batch, n, k = nn_idx.shape
        if jax.default_backend() == "cpu":
            # row-slice gathers are fine on CPU; the one-hot matmul wins on TPU
            v_nbr = gather_rows(v, nn_idx.reshape(*batch, n * k)).reshape(
                *batch, n, k, self.features
            )
        else:
            v_nbr = _gather_neighbors_matmul(v, nn_idx)
        pre = a[..., :, None, :] + v_nbr - v[..., :, None, :]
        pre = EmaBatchNorm(name="bn")(
            pre.astype(jnp.float32), train=train, momentum=momentum
        )
        if self.dtype is not None:
            pre = pre.astype(self.dtype)
        return nn.relu(pre)


class _FusedEdgeConv(nn.Module):
    """One-kernel edge conv + BN + relu + mean (ops.edgeconv_pallas).

    Identical parameter tree to ``_EdgeConv`` + mean aggregation (the
    submodules 'dense' and 'bn' carry the same names, shapes, and inits),
    so checkpoints move freely between the fused and XLA paths.  Training
    computes the BN batch moments with a first VMEM pass
    (edge_conv_moments); autodiff through the moments -> affine -> apply
    chain reproduces the full batch-norm gradient.
    """

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, nn_idx, train: bool, momentum):
        from cloudaae_tpu.ops.edgeconv_pallas import (
            edge_conv_mean, edge_conv_moments,
        )

        kernel, bias = _SplitEdgeKernel(
            self.features, self.dtype, raw=True, name="dense"
        )(x)
        cdt = str(self.dtype) if self.dtype is not None else "float32"
        if train:
            s1, s2 = edge_conv_moments(x, kernel, bias, nn_idx, cdt)
            count = x.shape[0] * x.shape[1] * nn_idx.shape[-1]
            mean = jnp.sum(s1, axis=0) / count
            var = jnp.sum(s2, axis=0) / count - jnp.square(mean)
        else:
            mean = var = None
        scale, shift = EmaBatchNormAffine(self.features, name="bn")(
            mean, var, train, momentum
        )
        return edge_conv_mean(x, kernel, bias, scale, shift, nn_idx, cdt)


class EdgeConvBlock(nn.Module):
    """kNN -> edge features -> 1x1 conv -> mean/max over neighbors.

    Mirrors one DGCNN block (models/pointnet_ycb_23_decoder_4.py:337-350):
    neighborhoods come from the first 3 channels of the *current* features
    (utils/tf_util.py:608), edge features are concat(center, nbr - center).
    The conv is applied in split-linear form (see _SplitEdgeKernel) — exact
    same math, k-fold fewer MACs.  With ``fused=True`` (mean aggregation
    only) the whole post-kNN chain runs as one Pallas kernel.
    """

    features: int
    k: int
    aggregation: str = "mean"
    dtype: jnp.dtype | None = None
    knn_approx_recall: float | None = None
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, momentum) -> jnp.ndarray:
        # kNN geometry in f32 regardless of compute dtype: neighbor identity
        # flips under bf16 rounding of mm-scale coordinates
        idx = knn_indices(
            pairwise_sq_dist(x.astype(jnp.float32)), self.k,
            approx_recall=self.knn_approx_recall,
        )
        if self.fused and self.aggregation == "mean":
            return _FusedEdgeConv(self.features, self.dtype, name="conv")(
                x, idx, train, momentum
            )
        ef = _EdgeConv(self.features, self.dtype, name="conv")(
            x, idx, train, momentum
        )
        if self.aggregation == "mean":
            return jnp.mean(ef, axis=-2)
        return jnp.max(ef, axis=-2)


class DGCNNEncoder(nn.Module):
    """4 EdgeConv blocks + 1024 aggregation conv + global mean/max pool."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, momentum):
        dtype = _dtype_of(self.cfg)
        fused = self.cfg.edgeconv_fused
        if fused is None:  # auto: fused Pallas path on accelerators
            fused = jax.default_backend() != "cpu"
        fused = fused and self.cfg.aggregation == "mean"
        feats = []
        for i, f in enumerate(self.cfg.edge_conv_channels):
            x = EdgeConvBlock(
                f, self.cfg.k_neighbor, self.cfg.aggregation, dtype=dtype,
                knn_approx_recall=self.cfg.knn_approx_recall, fused=fused,
                name=f"dgcnn{i+1}",
            )(x, train, momentum)
            feats.append(x)
        agg = Dense(self.cfg.agg_channels, dtype=dtype, name="dgcnn_agg")(
            jnp.concatenate(feats, axis=-1), train=train, momentum=momentum
        )
        if self.cfg.aggregation == "mean":
            emb = jnp.mean(agg, axis=-2)
        else:
            emb = jnp.max(agg, axis=-2)
        return emb, agg


class PointNetEncoder(nn.Module):
    """Shared-MLP PointNet encoder + max pool (get_model_pn :38-63).

    The reference's first conv has kernel [1, point_dim] over (B,N,C,1) —
    i.e. a Dense over all input channels; the rest are 1x1 convs.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, momentum):
        dtype = _dtype_of(self.cfg)
        for i, f in enumerate((64, 64, 64, 128, 1024)):
            x = Dense(f, dtype=dtype, name=f"pn_conv{i+1}")(
                x, train=train, momentum=momentum
            )
        return jnp.max(x, axis=-2), x


class FCHead(nn.Module):
    """FC stack with BN on the hidden layers and a linear output."""

    hidden: tuple[int, ...]
    out: int
    name_prefix: str = "fc"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, momentum):
        for i, f in enumerate(self.hidden):
            x = Dense(f, dtype=self.dtype, name=f"{self.name_prefix}{i+1}")(
                x, train=train, momentum=momentum
            )
        out = Dense(
            self.out, use_bn=False, activation=None, dtype=self.dtype,
            name=f"{self.name_prefix}_out",
        )(x)
        # heads/decoder emit geometry: return f32
        return out.astype(jnp.float32)


class CloudAAE(nn.Module):
    """Augmented autoencoder with pose-regression heads.

    Input: (B, N, 3 + num_class) mean-centered xyz ++ tiled class one-hot
    (train_cloudAAE_ycbv.py:206-230).  Output: (recon residual cloud
    (B, N*mult, recon_channels), rot axis-angle (B, 3), trans residual
    (B, 3), endpoints dict).  For head-less AE variants rot/trans are None.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        train_encoder: bool = False,
        train_heads: bool = False,
        momentum=0.9,
    ):
        cfg = self.cfg
        end_points: dict = {}

        if cfg.encoder == "pointnet":
            emb, per_point = PointNetEncoder(cfg, name="encoder")(
                points, train_encoder, momentum
            )
        else:
            emb, per_point = DGCNNEncoder(cfg, name="encoder")(
                points, train_encoder, momentum
            )
        end_points["embedding"] = emb
        end_points["layer_before_embedding"] = per_point

        z = emb
        if cfg.vae:
            # get_model_dgcnn_mean_vae :859-983: both stats go through
            # BN+ReLU FCs (z_std is relu-clamped, not a log-variance), and
            # sampling is unconditional.
            z_mean = Dense(cfg.agg_channels, name="z_mean")(z, train_heads, momentum)
            z_std = Dense(cfg.agg_channels, name="z_std")(z, train_heads, momentum)
            eps = jax.random.normal(self.make_rng("vae"), z_mean.shape, z_mean.dtype)
            z = z_mean + z_std * eps
            end_points["z_mean"], end_points["z_std"] = z_mean, z_std

        num_point = points.shape[-2]
        recon_dim = num_point * cfg.recon_channels * cfg.recon_multiplier
        recon_flat = FCHead(
            cfg.decoder_fc, recon_dim, dtype=_dtype_of(cfg),
            name="decoder", name_prefix="fc",
        )(z, train_heads, momentum)
        recon = recon_flat.reshape(
            *recon_flat.shape[:-1],
            num_point * cfg.recon_multiplier,
            cfg.recon_channels,
        )

        if not cfg.with_heads:
            return recon, None, None, end_points

        rot = FCHead(cfg.head_fc, cfg.rot_out_dim, dtype=_dtype_of(cfg),
                     name="rot_head", name_prefix="fc")(
            emb, train_heads, momentum
        )
        trans = FCHead(cfg.head_fc, 3, dtype=_dtype_of(cfg),
                       name="trans_head", name_prefix="fc")(
            emb, train_heads, momentum
        )
        return recon, rot, trans, end_points


# Named presets mirroring the reference's builder functions.
_PRESETS: dict[str, dict] = {
    "pn_6d": dict(encoder="pointnet"),
    "dgcnn_ae_max": dict(aggregation="max", with_heads=False),
    "dgcnn_ae_mean": dict(aggregation="mean", with_heads=False),
    "dgcnn_mean_6d": dict(),
    # the reference's `_2` builder is the same net under a second variable
    # scope for dual-instance graphs (models:726) — in flax that's just a
    # second module instance; the preset exists so names map 1:1.
    "dgcnn_mean_6d_2": dict(),
    "dgcnn_mean_6d_hand": dict(recon_channels=5, recon_multiplier=1),
    "dgcnn_max_6d": dict(aggregation="max"),
    "dgcnn_mean_vae": dict(vae=True, with_heads=False),
}


def apply_preset(cfg: ModelConfig, name: str) -> ModelConfig:
    """Fold a preset's architecture fields into a ModelConfig.

    Train-time configs must pass through this so the run dir's archived
    config.json records the true architecture (aggregation, heads, vae,
    ...), not just the preset name — evaluation rebuilds the model from
    that file alone.
    """
    if name not in _PRESETS:
        raise ValueError(f"unknown model '{name}'; have {sorted(_PRESETS)}")
    return dataclasses.replace(cfg, name=name, **_PRESETS[name])


def make_model(cfg: ModelConfig | None = None, name: str | None = None) -> CloudAAE:
    """Build a model by preset name (see module docstring) or config."""
    cfg = cfg or ModelConfig()
    if name is not None:
        cfg = apply_preset(cfg, name)
    return CloudAAE(cfg)
