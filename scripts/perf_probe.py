"""Perf probe: sized measurements for the round's throughput leads.

Measures the fused train step at the headline config (B=128, N=256) under:
  * single-step dispatch (the bench.py baseline)
  * multi-step dispatch (lax.scan over K batches per device program)
  * hpr_iters 8 -> 6 (the loss-trajectory-gated synthesis knob)

Run on the real TPU when it is free:

    python scripts/perf_probe.py [--iters 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_step(step_fn, state, table, key, b, iters, spc=1):
    import jax  # noqa: F401

    for i in range(2):
        state, m = step_fn(state, table, np.asarray(i * b, np.int32), key)
    float(np.asarray(m["total_loss"]))
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step_fn(
            state, table, np.asarray(i * spc * b, np.int32), key
        )
    float(np.asarray(m["total_loss"]))
    dt = time.perf_counter() - t0
    steps = iters * spc
    return dt / steps, steps * b / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--hpr-iters", type=int, nargs="*", default=[8, 6])
    p.add_argument("--spc", type=int, nargs="*", default=[1, 4, 8])
    args = p.parse_args()

    import dataclasses

    import jax

    from cloudaae_tpu.config import Config
    from cloudaae_tpu.data import load_object_models
    from cloudaae_tpu.models import make_model
    from cloudaae_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_multistep_from_table,
        make_train_step_from_table,
    )

    obj = load_object_models(
        "/root/reference/object_model_tfrecord/obj_models.tfrecords"
    )
    mesh = make_mesh(dp=-1, tp=1)
    rng = np.random.default_rng(0)

    base = Config()
    b = base.train.batch_size
    n = b * max(args.iters, 8) * max(args.spc)
    table = jax.device_put(
        (
            np.concatenate(
                [rng.normal(0, 0.04, (n, 2)), rng.uniform(0.6, 0.9, (n, 1))],
                axis=1,
            ).astype(np.float32),
            rng.normal(0, 1.2, (n, 3)).astype(np.float32),
            rng.integers(0, base.model.num_class, n).astype(np.int32),
        )
    )
    key = jax.random.key(1)

    for hpr in args.hpr_iters:
        cfg = dataclasses.replace(
            base, synth=dataclasses.replace(base.synth, hpr_iters=hpr)
        )
        model = make_model(cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0))
        for spc in args.spc:
            if spc == 1:
                fn = make_train_step_from_table(model, cfg, obj, mesh)
            else:
                fn = make_train_multistep_from_table(
                    model, cfg, obj, mesh, steps_per_call=spc
                )
            ms, sps = time_step(
                fn, state, table, key, b, args.iters, spc=spc
            )
            print(
                json.dumps(
                    {
                        "hpr_iters": hpr,
                        "steps_per_call": spc,
                        "step_ms": round(ms * 1000, 2),
                        "samples_per_sec": round(sps, 1),
                        "vs_baseline": round(sps / 148.0, 2),
                    }
                ),
                flush=True,
            )
            # fresh state per config (donation consumed the old one)
            state = create_train_state(model, cfg, jax.random.key(0))


if __name__ == "__main__":
    main()
