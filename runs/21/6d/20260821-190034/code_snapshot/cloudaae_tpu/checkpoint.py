"""Checkpointing (orbax) and TF-checkpoint import.

The reference checkpoints the full TF graph each epoch with
``tf.train.Saver(max_to_keep=None)`` (train_cloudAAE_ycbv.py:276,423-431)
and supports scope-filtered partial restore for frozen-encoder finetuning
(trained_network/.../train_6d_...compact.py:372-409).  Equivalents here:

  * ``save``/``restore``: orbax checkpoints of the full TrainState
    (params + batch_stats + opt_state + step), so training resumes
    mid-run — a capability the reference lacks (it always restarts at
    epoch 0, SURVEY.md §5.4).
  * ``import_tf_checkpoint``: name-mapped import of reference checkpoints
    (``dgcnn1/weights`` -> encoder/dgcnn1/conv/dense/kernel etc.) for
    parity evaluation.  Note the shipped 20200908 checkpoint's data blob is
    absent from the reference mount (SURVEY.md §2 inventory) — the mapping
    is exercised against freshly-initialized TF-style shape/name tables in
    tests.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(ckpt_dir: str, state: Any, step: int) -> str:
    """Save a TrainState under ckpt_dir/step_<N>."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:09d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    return path


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and not d.endswith(".tmp")
    ]
    return max(steps) if steps else None


def restore(ckpt_dir: str, target: Any, step: int | None = None) -> Any:
    """Restore a TrainState (latest step by default) shaped like ``target``."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:09d}")
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def restore_any(path: str, target: Any, step: int | None = None) -> Any:
    """Restore from an orbax ckpt dir OR a params ``.npz`` export.

    Resolution order for a directory ``path``: a full orbax checkpoint
    (``path`` itself holding ``step_*`` dirs, or ``path/ckpt``) wins — it
    carries optimizer state, so ``--resume`` keeps its Adam moments.  Only
    when no orbax checkpoint exists does the ``params_latest.npz`` survival
    artifact load, and then the target's opt_state is kept as-is (fresh) —
    fine for eval/inference and warm-start finetunes, and logged as such.
    """
    import dataclasses
    import logging

    npz = None
    if os.path.isfile(path) and path.endswith(".npz"):
        npz = path
    elif os.path.isdir(path):
        if latest_step(path) is not None:
            return restore(path, target, step)
        sub = os.path.join(path, "ckpt")
        if latest_step(sub) is not None:
            return restore(sub, target, step)
        if os.path.isfile(os.path.join(path, "params_latest.npz")):
            npz = os.path.join(path, "params_latest.npz")
    if npz is None:
        return restore(path, target, step)
    params, batch_stats, loaded_step = load_params(npz)
    if step is not None and loaded_step != step:
        raise ValueError(
            f"requested step {step} but {npz} holds step {loaded_step} "
            "(npz exports keep only the latest params)"
        )
    logging.getLogger(__name__).warning(
        "restoring params-only npz %s (step %d): optimizer state reset",
        npz, loaded_step,
    )
    return dataclasses.replace(
        target,
        params=params,
        batch_stats=batch_stats,
        step=np.asarray(loaded_step, dtype=np.int32),
    )


def export_params(state: Any, out_path: str) -> str:
    """Optimizer-state-free deploy artifact: one ``.npz`` of params +
    batch_stats + step (~1/3 of a full TrainState checkpoint — no Adam
    slots).  The reference has no equivalent: ``tf.train.Saver`` always
    carries optimizer variables (train_cloudAAE_ycbv.py:276).  Load with
    :func:`load_params` / ``infer.Predictor.from_params``.
    """
    from flax import traverse_util

    flat = {}
    for prefix, tree in (
        ("params", state.params),
        ("batch_stats", state.batch_stats),
    ):
        for path, leaf in traverse_util.flatten_dict(tree).items():
            key = "/".join((prefix,) + tuple(path))
            flat[key] = np.asarray(jax.device_get(leaf))
    flat["step"] = np.asarray(int(state.step), np.int64)
    if not out_path.endswith(".npz"):
        out_path += ".npz"
    # atomic: a mid-write interruption must not leave a truncated npz that
    # restore_any would then pick up (np.savez appends .npz to paths that
    # lack it, so the tmp name must already end in .npz)
    tmp = out_path + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, out_path)
    return out_path


def load_params(path: str) -> tuple[dict, dict, int]:
    """Inverse of :func:`export_params` -> (params, batch_stats, step)."""
    from flax import traverse_util

    data = np.load(path)
    trees: dict[str, dict] = {"params": {}, "batch_stats": {}}
    step = 0
    for key in data.files:
        if key == "step":
            step = int(data[key])
            continue
        head, *rest = key.split("/")
        trees[head][tuple(rest)] = data[key]
    return (
        traverse_util.unflatten_dict(trees["params"]),
        traverse_util.unflatten_dict(trees["batch_stats"]),
        step,
    )


def transfer_encoder(src_state: Any, dst_state: Any) -> Any:
    """Copy encoder params + batch stats from one state into another.

    The scope-filtered partial restore the shipped checkpoint's finetune
    used (trained_network/.../train_6d_...compact.py:372-409: restore only
    dgcnn1..dgcnn_agg) — here the encoder subtree moves wholesale; combine
    with TrainConfig.train_encoder=False to freeze it.
    """
    import dataclasses

    params = dict(dst_state.params)
    params["encoder"] = src_state.params["encoder"]
    stats = dict(dst_state.batch_stats)
    stats["encoder"] = src_state.batch_stats["encoder"]
    return dataclasses.replace(
        dst_state, params=type(dst_state.params)(params),
        batch_stats=type(dst_state.batch_stats)(stats),
    )


def transfer_compatible(
    src_params: Any, src_stats: Any, dst_state: Any
) -> tuple[Any, list[str]]:
    """Warm-start across an architecture change: copy every param/stat leaf
    whose tree path AND shape match; leave the rest freshly initialized.

    The generalization of :func:`transfer_encoder` for head-shape changes —
    e.g. growing the rotation head to k hypotheses
    (ModelConfig.num_rot_hyp) keeps the encoder, decoder, translation
    head, and rot-head hidden layers while only ``rot_head/fc_out`` (whose
    output dim changed) re-initializes.  Returns ``(new_state, skipped)``
    where ``skipped`` lists the destination paths left fresh.
    """
    import dataclasses

    from flax import traverse_util

    skipped: list[str] = []

    def merge(src_tree, dst_tree, prefix):
        src_flat = traverse_util.flatten_dict(src_tree)
        dst_flat = dict(traverse_util.flatten_dict(dst_tree))
        for path, leaf in dst_flat.items():
            cand = src_flat.get(path)
            if cand is not None and tuple(np.shape(cand)) == tuple(
                np.shape(leaf)
            ):
                dst_flat[path] = jax.numpy.asarray(
                    np.asarray(cand), np.asarray(leaf).dtype
                )
            else:
                skipped.append(prefix + "/" + "/".join(map(str, path)))
        return traverse_util.unflatten_dict(dst_flat)

    params = merge(src_params, dst_state.params, "params")
    stats = merge(src_stats, dst_state.batch_stats, "batch_stats")
    return dataclasses.replace(
        dst_state, params=params, batch_stats=stats
    ), skipped


# ------------------------------------------------------- TF-name mapping

# flax module path fragments -> TF variable scopes
# (models/pointnet_ycb_23_decoder_4.py:327-455 scope names).
_TF_SCOPE_BY_FLAX = {
    "encoder/dgcnn1/conv": "dgcnn1",
    "encoder/dgcnn2/conv": "dgcnn2",
    "encoder/dgcnn3/conv": "dgcnn3",
    "encoder/dgcnn4/conv": "dgcnn4",
    "encoder/dgcnn_agg": "dgcnn_agg",
    "decoder/fc1": "dgcnn_fc1",
    "decoder/fc2": "dgcnn_fc2",
    "decoder/fc_out": "dgcnn_output",
    "rot_head/fc1": "dgcnn_rot_fc1",
    "rot_head/fc2": "dgcnn_rot_fc2",
    "rot_head/fc_out": "dgcnn_output_rot",
    "trans_head/fc1": "dgcnn_trans_fc1",
    "trans_head/fc2": "dgcnn_trans_fc2",
    "trans_head/fc_out": "dgcnn_output_trans",
}


def tf_variable_name(
    flax_path: tuple[str, ...], available: set[str] | None = None
) -> str | None:
    """Map a flax param/stat path to the reference TF variable name.

    params:  .../dense/kernel -> <scope>/weights ; /dense/bias -> <scope>/biases
             .../bn/scale -> <scope>/bn/gamma ; /bn/bias -> <scope>/bn/beta
    stats:   .../bn/mean -> <scope>/bn/...moments/Squeeze/ExponentialMovingAverage

    The EMA variables embed the *run's* outer name_scope between the
    variable scope and the moments suffix (the shipped checkpoint has
    ``dgcnn1/bn/6d_pose/dgcnn1/bn/moments/Squeeze/EMA...``; a repo-script
    run would say ``decoder`` instead of ``6d_pose``), so EMA names resolve
    by prefix+suffix search over ``available`` names when given.
    """
    names = "/".join(flax_path)
    for flax_frag, tf_scope in _TF_SCOPE_BY_FLAX.items():
        if names.startswith(flax_frag + "/"):
            leaf = names[len(flax_frag) + 1 :]
            direct = {
                "dense/kernel": f"{tf_scope}/weights",
                "dense/bias": f"{tf_scope}/biases",
                "bn/scale": f"{tf_scope}/bn/gamma",
                "bn/bias": f"{tf_scope}/bn/beta",
            }
            if leaf in direct:
                return direct[leaf]
            suffix = {
                "bn/mean": "moments/Squeeze/ExponentialMovingAverage",
                "bn/var": "moments/Squeeze_1/ExponentialMovingAverage",
            }.get(leaf)
            if suffix is None:
                return None
            prefix = f"{tf_scope}/bn/"
            if available is not None:
                for cand in available:
                    if cand.startswith(prefix) and cand.endswith(suffix):
                        return cand
                return None
            return prefix + suffix
    return None


def import_tf_checkpoint(
    tf_vars: dict[str, np.ndarray], params: Any, batch_stats: Any
):
    """Fill flax params/batch_stats from a {tf_name: array} table.

    ``tf_vars`` comes from ``tf.train.load_checkpoint`` reading a reference
    checkpoint (conv kernels (1,1,in,out) are squeezed to (in,out)).
    Returns (params, batch_stats, missing_names).
    """
    missing: list[str] = []
    available = set(tf_vars)

    def fill(tree, kind):
        def one(path, leaf):
            names = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
            tf_name = tf_variable_name(names, available)
            if tf_name is None or tf_name not in tf_vars:
                missing.append("/".join(names))
                return leaf
            arr = np.asarray(tf_vars[tf_name])
            if arr.ndim == 4:  # (1, 1, in, out) conv kernel
                arr = arr.reshape(arr.shape[-2], arr.shape[-1])
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"{tf_name}: shape {arr.shape} != {leaf.shape}"
                )
            return jax.numpy.asarray(arr, leaf.dtype)

        return jax.tree_util.tree_map_with_path(one, tree)

    return fill(params, "params"), fill(batch_stats, "stats"), missing
