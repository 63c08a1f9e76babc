"""Training entry point — the equivalent of ``train_cloudAAE_ycbv.py``.

    python -m cloudaae_tpu.train --data-root /root/reference \\
        --max-epoch 90 --batch-size 128

Argument groups mirror the reference's argparse layout
(train_cloudAAE_ycbv.py:440-475: general / training_options /
hyperparameters) with TPU-era additions (mesh shape, HPR iterations,
resume).  The training loop: shuffled pose batches stream from host numpy
(10 MB total), and each step is ONE jitted device program doing synthesis,
the DGCNN forward/backward, and the Adam update (parallel/train_step.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import numpy as np

from cloudaae_tpu import checkpoint, metrics
from cloudaae_tpu import config as config_mod
from cloudaae_tpu.config import Config
from cloudaae_tpu.data import PoseBatcher, load_object_models, load_pose_records
from cloudaae_tpu.models import make_model
from cloudaae_tpu.parallel import (
    create_train_state,
    make_mesh,
    make_train_step_from_table,
)
from cloudaae_tpu.parallel.mesh import shard_state


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    general = p.add_argument_group("general")
    general.add_argument("--model", default="dgcnn_mean_6d")
    general.add_argument("--log-dir", default="log")
    general.add_argument("--num-point", type=int, default=256)
    general.add_argument("--data-root", default="/root/reference",
                         help="directory holding ycb_video_data_tfRecords/ "
                              "and object_model_tfrecord/")
    general.add_argument("--dataset", choices=["ycbv", "linemod"],
                         default="ycbv",
                         help="selects the synthesis frustum/camera model "
                              "(utils/generate_occluder.py:40-51 dataset "
                              "branches) and the class count (21 vs 13)")
    general.add_argument("--object-models", default=None,
                         help="object-model tfrecord path (overrides the "
                              "YCB default under --data-root; required for "
                              "the LINEMOD flow, whose models are not "
                              "shipped with the reference)")
    general.add_argument("--classes", type=int, nargs="*", default=None,
                         help="subset of class ids to train on")

    train_opts = p.add_argument_group("training_options")
    train_opts.add_argument("--max-epoch", type=int, default=500)
    train_opts.add_argument("--max-steps", type=int, default=None,
                            help="stop after N steps (smoke tests)")
    train_opts.add_argument("--optimizer", default="adam", choices=["adam", "gd"])
    train_opts.add_argument("--resume", default=None,
                            help="checkpoint dir to resume from")
    train_opts.add_argument("--freeze-encoder", action="store_true")
    train_opts.add_argument("--generate-poses", action="store_true",
                            help="sample poses on device instead of reading "
                                 "the shipped pose tfrecords")
    train_opts.add_argument("--sym-loss", action="store_true",
                            help="symmetry-aware rotation loss: min-over-"
                                 "group geodesic with per-class symmetry "
                                 "groups auto-detected from the object "
                                 "models (cloudaae_tpu/symmetry.py)")
    train_opts.add_argument("--sym-view", action="store_true",
                            help="with --sym-loss: extend the groups with "
                                 "depth-view-equivalent rotations (a can's "
                                 "top-bottom flip) so the loss stops "
                                 "penalizing ambiguities the depth camera "
                                 "cannot resolve "
                                 "(symmetry.detect_view_symmetries); "
                                 "raises the group table size to 32")
    train_opts.add_argument("--real-records", nargs="*", default=None,
                            help="FPS-presampled real-segment tfrecords: "
                                 "train on real data (the shipped ckpt's "
                                 "finetune recipe; combine with "
                                 "--freeze-encoder and --transfer-encoder)")
    train_opts.add_argument("--transfer-encoder", default=None,
                            help="checkpoint dir whose encoder initializes "
                                 "this run (partial restore)")
    train_opts.add_argument("--transfer-compatible", default=None,
                            help="run dir (or params npz) whose shape-"
                                 "compatible leaves warm-start this run; "
                                 "leaves whose path/shape differ — e.g. a "
                                 "rot head grown to --rot-hyp k — stay "
                                 "freshly initialized "
                                 "(checkpoint.transfer_compatible)")

    hyper = p.add_argument_group("hyperparameters")
    hyper.add_argument("--batch-size", type=int, default=128)
    hyper.add_argument("--compute-dtype",
                       default=config_mod.ModelConfig.compute_dtype,
                       choices=["float32", "bfloat16"])
    hyper.add_argument("--rot-rep", default=config_mod.ModelConfig.rot_rep,
                       choices=["axag", "6d"],
                       help="rotation-head representation: 'axag' = the "
                            "reference's 3-vector axis-angle; '6d' = "
                            "continuous Gram-Schmidt representation "
                            "(so3.rot6d_to_mat) — use with "
                            "--generate-poses for full-SO(3) coverage")
    hyper.add_argument("--rot-hyp", type=int,
                       default=config_mod.ModelConfig.num_rot_hyp,
                       help="rotation hypotheses k: the head predicts k "
                            "rotations + k confidence logits, trained with "
                            "a relaxed winner-take-all min-over-hypotheses "
                            "symmetry-aware loss "
                            "(symmetry.rotation_error_multihyp) — the "
                            "structural fix for view-dependent partial "
                            "ambiguities (pitcher/mug handles) that per-"
                            "class symmetry groups cannot express; k=1 is "
                            "the reference head")
    hyper.add_argument("--edgeconv-fused", default="auto",
                       choices=["auto", "on", "off"],
                       help="fused Pallas edge-conv kernels "
                            "(ops.edgeconv_pallas): 'auto' enables them on "
                            "TPU backends; an implementation choice, not "
                            "an architecture change")
    hyper.add_argument("--learning-rate", type=float, default=8e-4)
    hyper.add_argument("--hpr-iters", type=int,
                       default=config_mod.SynthConfig.hpr_iters)
    hyper.add_argument("--dp", type=int, default=-1)
    hyper.add_argument("--tp", type=int, default=1)
    hyper.add_argument("--log-every", type=int, default=100)
    hyper.add_argument("--steps-per-call", type=int, default=1,
                       help="train steps fused into one device program "
                            "(lax.scan): amortizes per-dispatch overhead "
                            "on tunneled backends; must divide the epoch "
                            "step count (falls back to 1 otherwise)")
    hyper.add_argument("--checkpoint-every", type=int,
                       default=config_mod.TrainConfig.checkpoint_every_epochs,
                       help="epochs between checkpoint saves (the reference "
                            "saves each epoch end, train_cloudAAE_ycbv.py:"
                            "423-431; on tunneled backends the ~100 MB "
                            "device->host state fetch costs ~2 min/epoch, "
                            "so long runs want a sparser cadence — the "
                            "final epoch always saves)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of steps 10-15 "
                        "(after warmup) into <run_dir>/profile/")
    return p


def config_from_args(args) -> Config:
    from cloudaae_tpu.config import LINEMOD_NUM_CLASS
    from cloudaae_tpu.models import apply_preset

    cfg = Config()
    num_class = (
        LINEMOD_NUM_CLASS if args.dataset == "linemod"
        else cfg.model.num_class
    )
    cfg = dataclasses.replace(
        cfg,
        log_dir=args.log_dir,
        synth=dataclasses.replace(
            cfg.synth,
            num_input_points=args.num_point,
            num_target_points=args.num_point * 4,
            hpr_iters=args.hpr_iters,
            dataset=args.dataset,
        ),
        # apply_preset folds the preset's architecture fields in, so the
        # archived config.json alone rebuilds the exact trained model
        model=dataclasses.replace(
            apply_preset(cfg.model, args.model),
            num_point=args.num_point,
            compute_dtype=args.compute_dtype, num_class=num_class,
            rot_rep=args.rot_rep, num_rot_hyp=args.rot_hyp,
            edgeconv_fused={"auto": None, "on": True, "off": False}[
                args.edgeconv_fused
            ],
        ),
        loss=dataclasses.replace(
            cfg.loss, rot_sym=args.sym_loss, sym_view=args.sym_view,
            sym_max=32 if args.sym_view else cfg.loss.sym_max,
        ),
        train=dataclasses.replace(
            cfg.train,
            batch_size=args.batch_size,
            learning_rate=args.learning_rate,
            max_epoch=args.max_epoch,
            optimizer=args.optimizer,
            dp=args.dp,
            tp=args.tp,
            log_every=args.log_every,
            checkpoint_every_epochs=args.checkpoint_every,
            train_encoder=not args.freeze_encoder,
        ),
        data=dataclasses.replace(
            cfg.data,
            train_syn_dir=os.path.join(
                args.data_root, "ycb_video_data_tfRecords/train_syn"
            ),
            object_model_path=args.object_models or os.path.join(
                args.data_root, "object_model_tfrecord/obj_models.tfrecords"
            ),
            generate_poses=args.generate_poses,
        ),
    )
    return cfg


def generate_pose_table(cfg: Config, num: int, seed: int) -> dict[str, np.ndarray]:
    """On-device pose generation (synth.frustum) when no records are used."""
    from cloudaae_tpu.synth import sample_pose

    keys = jax.random.split(jax.random.key(seed), num)
    axag, _, trans = jax.vmap(
        lambda k: sample_pose(k, cfg.synth.camera)
    )(keys)
    rng = np.random.default_rng(seed)
    return {
        "translation": np.asarray(trans, np.float32),
        "axisangle": np.asarray(axag, np.float32),
        "class_id": rng.integers(
            0, cfg.model.num_class, num, dtype=np.int32
        ),
    }


def _train_real(args, cfg, model, state, obj_models, log, run_dir, key):
    """Real-data finetune loop (the shipped checkpoint's recipe)."""
    from cloudaae_tpu.data.ycb_real import load_fps_records
    from cloudaae_tpu.parallel.train_step import make_train_step_real

    table = load_fps_records(args.real_records)
    n = len(table["class_id"])
    log.log_string(f"{n} real FPS records")
    step_fn = make_train_step_real(model, cfg, obj_models)
    rng = np.random.default_rng(cfg.train.seed)
    b = cfg.train.batch_size
    ckpt_dir = os.path.join(run_dir, "ckpt")
    step = int(state.step)
    for epoch in range(cfg.train.max_epoch):
        order = rng.permutation(n)[: (n // b) * b]
        for i in range(n // b):
            idx = order[i * b : (i + 1) * b]
            batch = (
                table["xyz"][idx], table["quaternion"][idx],
                table["translation"][idx], table["class_id"][idx],
            )
            state, m = step_fn(state, batch, key)
            step += 1
            if step % cfg.train.log_every == 0:
                m = jax.device_get(m)
                log.log_string(
                    f"[real] epoch {epoch} step {step} "
                    f"xyz {float(m['xyz_loss']):.6f} "
                    f"trans {float(m['trans_loss']):.4f} "
                    f"axag {float(m['axag_loss']):.4f}"
                )
            if args.max_steps and step >= args.max_steps:
                break
        checkpoint.save(ckpt_dir, state, step)
        checkpoint.export_params(
            state, os.path.join(run_dir, "params_latest.npz")
        )
        if args.max_steps and step >= args.max_steps:
            break
    log.close()
    return state


def main(argv=None):
    args = get_parser().parse_args(argv)
    if (args.dataset == "linemod" and not args.generate_poses
            and not args.real_records):
        raise SystemExit(
            "LINEMOD has no shipped synthetic pose records: train with "
            "--generate-poses (on-device frustum pose sampling with the "
            "LINEMOD camera) or finetune on converted records via "
            "--real-records"
        )
    cfg = config_from_args(args)

    run_dir = metrics.make_run_dir(cfg)
    log = metrics.MetricLogger(run_dir, cfg.model.num_class)
    log.log_string(f"run dir: {run_dir}")
    log.log_string(f"devices: {jax.devices()}")
    log.log_string(str(dataclasses.asdict(cfg)))

    obj_models = load_object_models(cfg.data.object_model_path)
    if args.generate_poses:
        poses = generate_pose_table(cfg, 381_553, cfg.train.seed)
    else:
        poses = load_pose_records(cfg.data.train_syn_dir, args.classes)
    log.log_string(
        f"{len(poses['class_id'])} pose records, "
        f"{obj_models.shape[0]} object models"
    )

    mesh = make_mesh(cfg.train.dp, cfg.train.tp)
    log.log_string(f"mesh: {mesh}")

    model = make_model(cfg.model)  # preset already folded into cfg.model
    key = jax.random.key(cfg.train.seed)
    state = create_train_state(model, cfg, key)
    if args.resume:
        state = checkpoint.restore_any(args.resume, state)
        log.log_string(f"resumed from {args.resume} at step {int(state.step)}")
    if args.transfer_encoder:
        src = checkpoint.restore(args.transfer_encoder, state)
        state = checkpoint.transfer_encoder(src, state)
        log.log_string(f"encoder transferred from {args.transfer_encoder}")
    if args.transfer_compatible:
        src_path = args.transfer_compatible
        if not src_path.endswith(".npz"):
            src_path = os.path.join(src_path, "params_latest.npz")
        src_params, src_stats, src_step = checkpoint.load_params(src_path)
        state, skipped = checkpoint.transfer_compatible(
            src_params, src_stats, state
        )
        log.log_string(
            f"warm start from {src_path} (step {src_step}); "
            f"fresh leaves: {skipped or 'none'}"
        )
    with mesh:
        state = shard_state(mesh, state)

    if args.real_records:
        return _train_real(args, cfg, model, state, obj_models, log, run_dir, key)

    batcher = PoseBatcher(poses, cfg.train.batch_size, cfg.train.seed)
    spc = max(args.steps_per_call, 1)
    if spc > 1 and batcher.steps_per_epoch % spc != 0:
        log.log_string(
            f"steps-per-call {spc} does not divide "
            f"{batcher.steps_per_epoch} steps/epoch; using 1"
        )
        spc = 1
    if spc > 1:
        from cloudaae_tpu.parallel import make_train_multistep_from_table

        train_step = make_train_multistep_from_table(
            model, cfg, obj_models, mesh, steps_per_call=spc
        )
    else:
        train_step = make_train_step_from_table(model, cfg, obj_models, mesh)
    ckpt_dir = os.path.join(run_dir, "ckpt")
    b = cfg.train.batch_size
    base_key = key

    step = int(state.step)
    profiler = metrics.StepProfiler(run_dir) if args.profile else None
    steps_this_process = 0
    t_epoch = time.time()
    start_epoch = step // max(batcher.steps_per_epoch, 1)
    for epoch in range(start_epoch, cfg.train.max_epoch):
        log.log_string(f"**** EPOCH {epoch:03d} ****")
        epoch_start_step = step
        # one 10 MB upload per epoch: the shuffled pose table lives on
        # device and each step slices its batch there — per-step
        # host->device transfers cost more than the step on tunneled
        # backends
        order = batcher.shuffled_order()
        table = jax.device_put(
            (
                poses["translation"][order],
                poses["axisangle"][order],
                poses["class_id"][order],
            )
        )
        for i in range(0, batcher.steps_per_epoch, spc):
            if profiler is not None:
                profiler.at_step(steps_this_process)
            state, m = train_step(
                state, table, np.asarray(i * b, np.int32), base_key
            )
            step += spc
            steps_this_process += spc
            # with K-step dispatch the counter advances in increments of K:
            # fire when the window [step-K, step] crosses a multiple of
            # log_every (`% == 0` alone would skip to lcm(K, log_every))
            if step % cfg.train.log_every < spc:
                m = jax.device_get(m)
                log.step(step, epoch, m)
                sym = (f" sym {float(m['axag_sym_loss']):.4f}"
                       if "axag_sym_loss" in m else "")
                log.log_string(
                    f"epoch {epoch} step {step} "
                    f"xyz {float(m['xyz_loss']):.6f} "
                    f"trans {float(m['trans_loss']):.4f} "
                    f"axag {float(m['axag_loss']):.4f}{sym}"
                )
            if step % cfg.train.summary_every < spc:
                log.flush_per_class(step)
            if args.max_steps and step >= args.max_steps:
                break
        dt = time.time() - t_epoch
        t_epoch = time.time()
        sps = (
            (step - epoch_start_step) * cfg.train.batch_size / dt
            if dt > 0 else 0.0
        )
        log.log_string(
            f"epoch {epoch} time {dt:.1f}s ({sps:.1f} samples/s)"
        )
        done = (epoch == cfg.train.max_epoch - 1
                or bool(args.max_steps and step >= args.max_steps))
        if done or (epoch + 1) % cfg.train.checkpoint_every_epochs == 0:
            checkpoint.save(ckpt_dir, state, step)
            # survival artifact: orbax step dirs are large and gitignored;
            # the ~MB params npz in the run dir is what snapshots carry
            checkpoint.export_params(
                state, os.path.join(run_dir, "params_latest.npz")
            )
        if done:
            break
    if profiler is not None:
        profiler.stop()
        log.log_string(f"profiler trace: {profiler.trace_dir}")
    log.close()
    return state


if __name__ == "__main__":
    main()
