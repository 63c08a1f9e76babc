"""The fused training step: synthesis -> DGCNN -> 3-term loss -> Adam.

One jitted, donated, mesh-sharded function per step.  Equivalent in
capability to the reference's ``setup_graph`` + per-step ``sess.run``
(train_cloudAAE_ycbv.py:137-368) with two structural upgrades:

  * the entire data synthesis (SURVEY.md §3.1 decode->HPR chain, host-bound
    in the reference) runs inside the same XLA program as the model;
  * only scalar metrics leave the device (the reference fetches 14 tensors
    including full point clouds every step, :350-368).

Loss = 1000 * chamfer + 10 * trans + axag (train_cloudAAE_ycbv.py:268).
Optimizer: Adam(lr) or GD(lr*10) (:263-266), with optional encoder/head
masking for frozen-encoder finetuning
(trained_network/.../train_6d_...compact.py:372-409).
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from cloudaae_tpu import so3
from cloudaae_tpu.config import Config, bn_decay_at
from cloudaae_tpu.models import CloudAAE
from cloudaae_tpu.ops import chamfer_loss
from cloudaae_tpu.synth import synthesize_batch


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.train.optimizer == "gd":
        # reference uses GradientDescentOptimizer(lr * 10) (:264)
        base = optax.sgd(cfg.train.learning_rate * 10.0)
    else:
        base = optax.adam(cfg.train.learning_rate)
    if cfg.train.train_encoder and cfg.train.train_heads:
        return base
    # frozen-subnetwork finetuning: zero updates on masked params
    def mask_fn(params):
        def mask_one(path, _):
            names = "/".join(
                p.key if hasattr(p, "key") else str(p) for p in path
            )
            in_encoder = names.startswith("encoder/")
            train = cfg.train.train_encoder if in_encoder else cfg.train.train_heads
            return "train" if train else "freeze"

        return jax.tree_util.tree_map_with_path(mask_one, params)

    return optax.multi_transform(
        {"train": base, "freeze": optax.set_to_zero()}, mask_fn
    )


def create_train_state(model: CloudAAE, cfg: Config, key: jax.Array) -> TrainState:
    """Initialize parameters, stats, and optimizer state."""
    b = cfg.train.batch_size
    n = cfg.synth.num_input_points
    dummy = jnp.zeros((b, n, 3 + cfg.model.num_class), jnp.float32)
    rngs = {"params": key}
    if cfg.model.vae:
        rngs["vae"] = jax.random.fold_in(key, 1)
    variables = model.init(rngs, dummy, train_encoder=False, train_heads=False)
    opt_state = make_optimizer(cfg).init(variables["params"])
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )


def _forward_and_losses(
    model: CloudAAE,
    cfg: Config,
    params,
    batch_stats,
    obj_models: jnp.ndarray,
    batch,
    key: jax.Array,
    train: bool,
    momentum,
    mutable: bool,
    sym_rots: np.ndarray | None = None,
):
    """Shared synthesis + forward + loss computation.

    ``sym_rots``: optional (C, S, 3, 3) per-class symmetry-rotation table
    (cloudaae_tpu/symmetry.py); when given, the rotation *loss* term is the
    min-over-group geodesic while the plain geodesic stays in the metrics.
    """
    translation, axisangle, class_id = batch

    synth = synthesize_batch(
        obj_models,
        class_id,
        axisangle,
        translation,
        key,
        cfg.synth,
        hpr_iters=cfg.synth.hpr_iters,
        hpr_slack=cfg.synth.hpr_slack,
    )
    # synthesized clouds are DATA: cut them out of the autodiff graph so
    # no backward pass is ever built through the synthesis pipeline
    vis = jax.lax.stop_gradient(synth["input_points"])      # (B, N, 3)
    target = jax.lax.stop_gradient(synth["target_points"])  # (B, 4N, 3)

    onehot = jax.nn.one_hot(class_id, cfg.model.num_class, dtype=vis.dtype)
    onehot = jnp.broadcast_to(
        onehot[:, None, :], (*vis.shape[:2], cfg.model.num_class)
    )
    # mean-center; translation is predicted as a residual to the mean
    # (train_cloudAAE_ycbv.py:224-233) — the translation-invariance trick.
    mean = jnp.mean(vis, axis=1)
    net_in = jnp.concatenate([vis - mean[:, None], onehot], axis=-1)

    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = dict(
        train_encoder=train and cfg.train.train_encoder,
        train_heads=train and cfg.train.train_heads,
        momentum=momentum,
    )
    rngs = {"vae": jax.random.fold_in(key, 2)} if cfg.model.vae else None
    if mutable:
        (recon_res, rot_pred, trans_res, _), updates = model.apply(
            variables, net_in, mutable=["batch_stats"], rngs=rngs, **kwargs
        )
        new_stats = updates["batch_stats"]
    else:
        recon_res, rot_pred, trans_res, _ = model.apply(
            variables, net_in, rngs=rngs, **kwargs
        )
        new_stats = batch_stats

    recon = recon_res + mean[:, None, :]
    trans_pred = trans_res + mean

    xyz_loss, xyz_per = chamfer_loss(recon, target)
    trans_loss, trans_per = so3.translation_error(trans_pred, translation)
    k = cfg.model.num_rot_hyp
    conf_loss = None
    sym_per = None
    if k > 1:
        from cloudaae_tpu import symmetry

        hyps, conf = so3.split_hypotheses(rot_pred, cfg.model.rot_rep_dim, k)
        R_hyps = so3.head_to_mat(hyps, cfg.model.rot_rep)  # (B, k, 3, 3)
        sym = (jnp.asarray(sym_rots)[class_id]
               if sym_rots is not None else None)
        rot_loss, sym_per, winner = symmetry.rotation_error_multihyp(
            R_hyps, axisangle, sym, relax=cfg.loss.hyp_relax
        )
        # confidence head: softmax CE against the stop-gradient winner so
        # inference can select the hypothesis without the ground truth
        conf_ce = optax.softmax_cross_entropy_with_integer_labels(
            conf.astype(jnp.float32), jax.lax.stop_gradient(winner)
        )
        conf_loss = jnp.mean(conf_ce)
        rot_loss = rot_loss + cfg.loss.hyp_conf_weight * conf_loss
        # metrics use the pose the model would OUTPUT: the confidence
        # argmax (evaluate/infer selection), not the oracle winner
        sel = jnp.argmax(conf, axis=-1)
        R_pred = jnp.take_along_axis(
            R_hyps, sel[:, None, None, None], axis=1
        )[:, 0]
        axag_loss, axag_per = so3.rotation_error_mat(R_pred, axisangle)
    else:
        R_pred = so3.head_to_mat(rot_pred, cfg.model.rot_rep)
        axag_loss, axag_per = so3.rotation_error_mat(R_pred, axisangle)
        if sym_rots is not None:
            from cloudaae_tpu import symmetry

            rot_loss, sym_per = symmetry.rotation_error_sym_mat(
                R_pred, axisangle, jnp.asarray(sym_rots)[class_id]
            )
        else:
            rot_loss = axag_loss

    total = (
        cfg.loss.chamfer_weight * xyz_loss
        + cfg.loss.trans_weight * trans_loss
        + cfg.loss.rot_weight * rot_loss
    )

    # per-class accumulators on device (reference keeps host lists,
    # train_cloudAAE_ycbv.py:394-397) — scalars only cross to the host.
    nc = cfg.model.num_class
    per_class = lambda v: jax.ops.segment_sum(v, class_id, num_segments=nc)
    metrics = {
        "total_loss": total,
        "xyz_loss": xyz_loss,
        "trans_loss": trans_loss,
        "axag_loss": axag_loss,
        "per_class_xyz": per_class(jnp.mean(xyz_per, axis=-1)),
        "per_class_trans": per_class(trans_per),
        "per_class_axag": per_class(axag_per),
        "per_class_count": per_class(jnp.ones_like(trans_per)),
        "num_vis_in_mean": jnp.mean(synth["num_vis_in"].astype(jnp.float32)),
        "num_vis_org_mean": jnp.mean(synth["num_vis_org"].astype(jnp.float32)),
    }
    if sym_rots is not None and sym_per is not None:
        # the interpretable rotation quantity: min over hypotheses (k > 1)
        # and symmetry group (== the sym geodesic for k = 1)
        metrics["axag_sym_loss"] = jnp.mean(sym_per)
    if conf_loss is not None:
        # k > 1 only: min-over-hypotheses geodesic + confidence CE
        metrics["axag_hyp_min"] = jnp.mean(sym_per)
        metrics["conf_ce"] = conf_loss
    return total, new_stats, metrics, (recon, rot_pred, trans_pred)


def _maybe_symmetry_table(cfg: Config, obj_models: np.ndarray):
    """Per-class symmetry tables as a host-numpy closure constant, or None."""
    if not cfg.loss.rot_sym:
        return None
    from cloudaae_tpu import symmetry

    table = symmetry.build_symmetry_table_cached(
        obj_models,
        max_syms=cfg.loss.sym_max,
        num_angles=cfg.loss.sym_angles,
        tol=cfg.loss.sym_tol,
        view_sym=cfg.loss.sym_view,
        view_tol=cfg.loss.sym_view_tol,
        view_frac=cfg.loss.sym_view_frac,
    )
    return np.asarray(table, np.float32)


def _build_step_fn(model: CloudAAE, cfg: Config, obj_models: jnp.ndarray):
    """The raw (unjitted) train step function."""
    tx = make_optimizer(cfg)
    # Keep the closure constant on the HOST (numpy): jit lowering embeds
    # closure constants by value, and pulling a device array back through
    # the device->host path is pathologically slow on tunneled backends
    # (a single 0.5 MB read measured at ~290 s on axon).
    obj_models = np.asarray(obj_models[..., :3], np.float32)
    sym_rots = _maybe_symmetry_table(cfg, obj_models)

    def step_fn(state: TrainState, batch, key: jax.Array):
        momentum = bn_decay_at(
            state.step.astype(jnp.float32) * cfg.train.batch_size, cfg.model
        )
        # derive the per-step key on device from the step counter: the host
        # loop passes one base key and never dispatches split() per step
        step_key = jax.random.fold_in(key, state.step)

        def loss_fn(params):
            total, new_stats, metrics, _ = _forward_and_losses(
                model, cfg, params, state.batch_stats, obj_models,
                batch, step_key, train=True, momentum=momentum, mutable=True,
                sym_rots=sym_rots,
            )
            return total, (new_stats, metrics)

        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        metrics["bn_decay"] = momentum
        return new_state, metrics

    return step_fn


def make_train_step(model: CloudAAE, cfg: Config, obj_models: jnp.ndarray):
    """Build the jitted train step: (state, batch, key) -> (state, metrics).

    ``batch`` = (translation (B,3), axisangle (B,3), class_id (B,)) —
    shard it along dp with ``parallel.shard_batch``; the state placement
    determines parameter sharding (replicated or tp-sharded kernels).
    """
    return jax.jit(_build_step_fn(model, cfg, obj_models), donate_argnums=0)


def make_train_step_from_table(
    model: CloudAAE, cfg: Config, obj_models: jnp.ndarray, mesh=None
):
    """Train step that slices its batch from a device-resident pose table.

    (state, table, start, key) -> (state, metrics), where ``table`` =
    (translation (M,3), axisangle (M,3), class_id (M,)) lives on device for
    a whole epoch (one ~10 MB upload) and ``start`` is the batch offset.
    On tunneled backends a per-step host->device batch upload costs more
    than the step itself; this variant removes all per-step transfers
    except the scalar offset.

    With a multi-device ``mesh`` the sliced batch is shard-constrained
    along dp so the synthesis fans out across chips.
    """
    inner = _build_step_fn(model, cfg, obj_models)
    b = cfg.train.batch_size
    sharding = None
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("dp"))

    def step_fn(state: TrainState, table, start, key: jax.Array):
        batch = tuple(
            jax.lax.dynamic_slice_in_dim(arr, start, b, axis=0)
            for arr in table
        )
        if sharding is not None:
            batch = tuple(
                jax.lax.with_sharding_constraint(x, sharding) for x in batch
            )
        return inner(state, batch, key)

    return jax.jit(step_fn, donate_argnums=0)


def make_train_multistep_from_table(
    model: CloudAAE,
    cfg: Config,
    obj_models: jnp.ndarray,
    mesh=None,
    steps_per_call: int = 4,
):
    """K train steps per device program: ``lax.scan`` over batch offsets.

    Same computation as :func:`make_train_step_from_table` K times, but ONE
    dispatch — on tunneled backends each dispatch costs real wall time, and
    at ~50 ms/step that overhead is a measurable slice.  Returned metrics
    are the LAST step's (the host loop samples metrics every ``log_every``
    steps anyway, so per-step metric fidelity is already subsampled).

    ``start`` is the offset of the FIRST batch; the K batches are
    ``table[start + i*B : ...]`` for i in 0..K-1.
    """
    inner = _build_step_fn(model, cfg, obj_models)
    b = cfg.train.batch_size
    sharding = None
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("dp"))

    def step_fn(state: TrainState, table, start, key: jax.Array):
        def body(st, off):
            batch = tuple(
                jax.lax.dynamic_slice_in_dim(arr, off, b, axis=0)
                for arr in table
            )
            if sharding is not None:
                batch = tuple(
                    jax.lax.with_sharding_constraint(x, sharding)
                    for x in batch
                )
            return inner(st, batch, key)

        offs = start + jnp.arange(steps_per_call, dtype=jnp.int32) * b
        state, ms = jax.lax.scan(body, state, offs)
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return jax.jit(step_fn, donate_argnums=0)


def make_train_step_real(model: CloudAAE, cfg: Config, obj_models: jnp.ndarray):
    """Train step for REAL pre-sampled segments — the shipped checkpoint's
    actual recipe (trained_network/.../train_6d_...compact.py:273-328):
    input = the first N points of an FPS-presampled real segment (no
    occluder injection, no sensor noise), reconstruction target = the clean
    HPR-visible segment of the gt-posed model, same 3-term loss.  Combine
    with ``TrainConfig.train_encoder=False`` (+ checkpoint.transfer_encoder)
    for frozen-encoder finetuning.

    batch = (xyz (B, total_N, 3), quaternion (B, 4), translation (B, 3),
             class_id (B,)).
    """
    tx = make_optimizer(cfg)
    obj_models_np = np.asarray(obj_models[..., :3], np.float32)

    def step_fn(state: TrainState, batch, key: jax.Array):
        xyz_full, quat, translation, class_id = batch
        momentum = bn_decay_at(
            state.step.astype(jnp.float32) * cfg.train.batch_size, cfg.model
        )
        step_key = jax.random.fold_in(key, state.step)
        axisangle = so3.quat_to_axag(quat)

        # clean reconstruction target: HPR-visible segment of the gt pose
        from cloudaae_tpu.ops import hpr as hpr_mod

        models = jnp.asarray(obj_models_np)[class_id]
        rot_gt = so3.exp_map(axisangle)
        posed = so3.transform_points(models, rot_gt, translation)
        keys = jax.random.split(step_key, posed.shape[0])
        target, _, _ = jax.vmap(
            lambda p, k: hpr_mod.hidden_point_removal(
                p, cfg.synth.num_target_points, k, cfg.synth.hpr_param,
                iters=cfg.synth.hpr_iters, slack=cfg.synth.hpr_slack,
            )
        )(posed, keys)
        target = jax.lax.stop_gradient(target)

        vis = xyz_full[:, : cfg.synth.num_input_points, :]
        onehot = jax.nn.one_hot(class_id, cfg.model.num_class, dtype=vis.dtype)
        onehot = jnp.broadcast_to(
            onehot[:, None, :], (*vis.shape[:2], cfg.model.num_class)
        )
        mean = jnp.mean(vis, axis=1)
        net_in = jnp.concatenate([vis - mean[:, None], onehot], axis=-1)

        def loss_fn(params):
            (recon_res, rot_pred, trans_res, _), upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                net_in,
                train_encoder=cfg.train.train_encoder,
                train_heads=cfg.train.train_heads,
                momentum=momentum,
                mutable=["batch_stats"],
            )
            recon = recon_res + mean[:, None, :]
            trans_pred = trans_res + mean
            xyz_loss, _ = chamfer_loss(recon, target)
            trans_loss, _ = so3.translation_error(trans_pred, translation)
            axag_loss, _ = so3.rotation_error_mat(
                so3.head_to_mat(rot_pred, cfg.model.rot_rep), axisangle
            )
            total = (
                cfg.loss.chamfer_weight * xyz_loss
                + cfg.loss.trans_weight * trans_loss
                + cfg.loss.rot_weight * axag_loss
            )
            metrics = {
                "total_loss": total,
                "xyz_loss": xyz_loss,
                "trans_loss": trans_loss,
                "axag_loss": axag_loss,
            }
            return total, (upd["batch_stats"], metrics)

        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=0)


def make_eval_step(model: CloudAAE, cfg: Config, obj_models: jnp.ndarray):
    """Synthetic-data eval step: losses + predictions, no state mutation."""
    obj_models = np.asarray(obj_models[..., :3], np.float32)
    sym_rots = _maybe_symmetry_table(cfg, obj_models)

    def step_fn(state: TrainState, batch, key: jax.Array):
        _, _, metrics, preds = _forward_and_losses(
            model, cfg, state.params, state.batch_stats, obj_models,
            batch, key, train=False, momentum=0.9, mutable=False,
            sym_rots=sym_rots,
        )
        return metrics, preds

    return jax.jit(step_fn)
