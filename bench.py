"""Headline benchmark: end-to-end synthesized-and-trained samples/sec.

Measures the fused train step (on-device synthesis -> DGCNN fwd/bwd ->
Adam) at the reference's production config (B=128, N=256, 21 classes,
2048-pt models, 2x200-pt occluders) on the attached TPU, against the
reference's only hard throughput number: ~148 synthesized+trained
samples/sec end-to-end on its 2020 single-GPU setup
(381,553 records / ~2580 s per epoch, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


BASELINE_SAMPLES_PER_SEC = 148.0  # BASELINE.md: derived from log_train.txt


def main():
    import os

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

    cfg = Config()
    obj_models = load_object_models(
        "/root/reference/object_model_tfrecord/obj_models.tfrecords"
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    mesh = make_mesh(dp=-1, tp=1)
    # steps fused per dispatch (lax.scan): amortizes the per-dispatch
    # overhead of the tunneled backend exactly as `train.py
    # --steps-per-call` does in the real loop (scripts/perf_probe.py for
    # the sizing)
    spc = int(os.environ.get("CLOUDAAE_BENCH_SPC", "8"))
    if spc > 1:
        step_fn = make_train_multistep_from_table(
            model, cfg, obj_models, mesh, steps_per_call=spc
        )
    else:
        step_fn = make_train_step_from_table(model, cfg, obj_models, mesh)

    rng = np.random.default_rng(0)
    b = cfg.train.batch_size * spc  # rows consumed per dispatch
    iters = 30
    n = b * iters
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

    key = jax.random.key(1)
    # warmup / compile.  NOTE: on the tunneled axon backend
    # jax.block_until_ready returns before execution completes; a host
    # fetch of a scalar that data-depends on every prior step (via the
    # donated state chain) is the only honest barrier.
    for i in range(3):
        state, m = step_fn(state, table, np.asarray(i * b, np.int32), key)
    float(np.asarray(m["total_loss"]))

    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step_fn(state, table, np.asarray(i * b, np.int32), key)
    float(np.asarray(m["total_loss"]))  # barrier: depends on all 30 steps
    dt = time.perf_counter() - t0

    samples_per_sec = iters * b / dt
    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_e2e",
                "value": round(samples_per_sec, 1),
                "unit": "synthesized+trained samples/sec/chip (B=128, N=256)",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
