"""Real-TPU gate for the fused Pallas edge-conv (ops.edgeconv_pallas).

Pattern follows the bf16 / approx-kNN validations recorded in config.py:
(1) forward + gradient parity fused-vs-XLA at the production shapes,
(2) a fresh-train loss-trajectory comparison over N steps,
(3) honest step timing for both paths (scalar-fetch barrier — see
.claude/skills/verify/SKILL.md on jax.block_until_ready).

    python scripts/validate_fused.py [--steps 300] [--skip-trajectory]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_table(rng, n, num_class):
    return (
        np.concatenate(
            [rng.normal(0, 0.04, (n, 2)), rng.uniform(0.6, 0.9, (n, 1))],
            axis=1,
        ).astype(np.float32),
        rng.normal(0, 1.2, (n, 3)).astype(np.float32),
        rng.integers(0, num_class, n).astype(np.int32),
    )


def run_path(fused: bool, steps: int, obj_models, time_iters: int = 30):
    import jax

    from cloudaae_tpu.config import Config
    from cloudaae_tpu.models import make_model
    from cloudaae_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step_from_table,
    )

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, edgeconv_fused=fused)
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    mesh = make_mesh(dp=-1, tp=1)
    step_fn = make_train_step_from_table(model, cfg, obj_models, mesh)

    rng = np.random.default_rng(0)
    b = cfg.train.batch_size
    table = jax.device_put(make_table(rng, b * max(steps, time_iters),
                                      cfg.model.num_class))
    key = jax.random.key(1)

    # compile + warmup
    for i in range(3):
        state, m = step_fn(state, table, np.asarray(i * b, np.int32), key)
    float(np.asarray(m["total_loss"]))

    # timing
    t0 = time.perf_counter()
    for i in range(time_iters):
        state, m = step_fn(state, table, np.asarray(i * b, np.int32), key)
    float(np.asarray(m["total_loss"]))
    dt = (time.perf_counter() - t0) / time_iters

    # fresh trajectory
    state = create_train_state(model, cfg, jax.random.key(0))
    traj = []
    for i in range(steps):
        state, m = step_fn(state, table, np.asarray(i * b, np.int32), key)
        if (i + 1) % 50 == 0:
            traj.append(
                {k: float(np.asarray(m[k]))
                 for k in ("total_loss", "xyz_loss", "axag_loss")}
            )
    return dt, traj


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--time-iters", type=int, default=30)
    args = p.parse_args()

    import jax

    from cloudaae_tpu.data import load_object_models

    print("devices:", jax.devices(), flush=True)
    obj_models = load_object_models(
        "/root/reference/object_model_tfrecord/obj_models.tfrecords"
    )

    dt_x, traj_x = run_path(False, args.steps, obj_models, args.time_iters)
    print(f"xla   step: {dt_x*1e3:.1f} ms  traj: {json.dumps(traj_x)}",
          flush=True)
    dt_f, traj_f = run_path(True, args.steps, obj_models, args.time_iters)
    print(f"fused step: {dt_f*1e3:.1f} ms  traj: {json.dumps(traj_f)}",
          flush=True)

    final_x, final_f = traj_x[-1], traj_f[-1]
    rel = abs(final_f["total_loss"] - final_x["total_loss"]) / max(
        final_x["total_loss"], 1e-9
    )
    print(
        json.dumps(
            {
                "xla_step_ms": round(dt_x * 1e3, 2),
                "fused_step_ms": round(dt_f * 1e3, 2),
                "speedup": round(dt_x / dt_f, 3),
                "final_total_xla": round(final_x["total_loss"], 4),
                "final_total_fused": round(final_f["total_loss"], 4),
                "final_rel_diff": round(rel, 4),
                "gate": "PASS" if rel < 0.10 else "FAIL",
            }
        )
    )


if __name__ == "__main__":
    main()
