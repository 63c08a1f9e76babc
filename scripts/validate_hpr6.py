"""Loss-trajectory gate for hpr_iters 8 -> 6 (the round-4 perf lead).

Two fresh training runs from identical seeds — one with 8 HPR support-
ascent iterations, one with 6 — compared on their loss trajectories.
PASS = the hpr6 run's tail losses are within the noise envelope of the
hpr8 run's (the knob changes the synthesized-data statistics slightly;
what matters is that the network learns the same task at the same rate).

Also prints the per-op visibility quality from tests/test_hpr.py's IoU
methodology at both settings (hull-oracle IoU on synthesized scenes is
measured there on CPU; here we only gate the trajectory).

    python scripts/validate_hpr6.py [--steps 400]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(hpr_iters: int, steps: int):
    import jax

    from cloudaae_tpu.config import Config
    from cloudaae_tpu.data import load_object_models
    from cloudaae_tpu.models import make_model
    from cloudaae_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step_from_table,
    )

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, synth=dataclasses.replace(cfg.synth, hpr_iters=hpr_iters)
    )
    obj = load_object_models(
        "/root/reference/object_model_tfrecord/obj_models.tfrecords"
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    mesh = make_mesh(dp=-1, tp=1)
    step_fn = make_train_step_from_table(model, cfg, obj, mesh)

    rng = np.random.default_rng(7)
    b = cfg.train.batch_size
    n = b * steps
    table = jax.device_put(
        (
            np.concatenate(
                [rng.normal(0, 0.04, (n, 2)), rng.uniform(0.6, 0.9, (n, 1))],
                axis=1,
            ).astype(np.float32),
            rng.normal(0, 1.2, (n, 3)).astype(np.float32),
            rng.integers(0, cfg.model.num_class, n).astype(np.int32),
        )
    )
    key = jax.random.key(3)
    losses = {"total": [], "xyz": [], "trans": [], "axag": []}
    for i in range(steps):
        state, m = step_fn(state, table, np.asarray(i * b, np.int32), key)
        if (i + 1) % 20 == 0:
            host = {k: float(np.asarray(m[k + "_loss"]))
                    for k in ("total", "xyz", "trans", "axag")}
            for k, v in host.items():
                losses[k].append(v)
    return losses


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--tail", type=int, default=5,
                   help="trailing samples (x20 steps) to compare")
    args = p.parse_args()

    res = {it: run_one(it, args.steps) for it in (8, 6)}
    report = {"steps": args.steps}
    ok = True
    for k in ("total", "xyz", "trans", "axag"):
        t8 = np.asarray(res[8][k][-args.tail:])
        t6 = np.asarray(res[6][k][-args.tail:])
        # noise envelope: the hpr8 run's own tail spread
        spread = max(float(t8.std()), 1e-9)
        delta = float(t6.mean() - t8.mean())
        rel = delta / max(abs(float(t8.mean())), 1e-9)
        pass_k = abs(delta) <= 3 * spread or abs(rel) <= 0.05
        report[k] = {
            "hpr8_tail_mean": float(t8.mean()),
            "hpr6_tail_mean": float(t6.mean()),
            "delta": delta,
            "rel": rel,
            "hpr8_tail_std": float(t8.std()),
            "pass": bool(pass_k),
        }
        ok = ok and pass_k
    report["PASS"] = bool(ok)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
