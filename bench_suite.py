"""Extended benchmark suite: all BASELINE.json headline configs.

Prints one JSON line per metric (bench.py remains the single-line headline
the driver records):

  1. end-to-end synthesized+trained samples/sec (the bench.py metric)
  2. on-device synthetic datagen: segments/sec at training batch rate
  3. inference poses/sec at the 256-point config
"""

import json
import time

import numpy as np


def synth_bench(batch_size: int = 128, iters: int = 30) -> dict:
    import jax
    import jax.numpy as jnp

    from cloudaae_tpu.config import Config
    from cloudaae_tpu.data import load_object_models
    from cloudaae_tpu.synth import synthesize_batch

    cfg = Config()
    obj = load_object_models(
        "/root/reference/object_model_tfrecord/obj_models.tfrecords"
    )[..., :3].astype(np.float32)
    rng = np.random.default_rng(0)
    b = batch_size
    cls = jnp.asarray(rng.integers(0, 21, b).astype(np.int32))
    axag = jnp.asarray(rng.normal(0, 1.2, (b, 3)).astype(np.float32))
    trans = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.04, (b, 2)), rng.uniform(0.6, 0.9, (b, 1))], axis=1
        ).astype(np.float32)
    )

    @jax.jit
    def fn(key):
        out = synthesize_batch(obj, cls, axag, trans, key, cfg.synth)
        # consume both outputs so neither HPR pass is dead-code-eliminated
        return jnp.sum(out["input_points"]) + jnp.sum(out["target_points"])

    keys = [jax.random.key(i) for i in range(iters + 1)]
    float(np.asarray(fn(keys[-1])))
    t0 = time.perf_counter()
    acc = None
    for i in range(iters):
        acc = fn(keys[i])
    float(np.asarray(acc))
    dt = time.perf_counter() - t0
    return {
        "metric": "synth_segments_per_sec",
        "value": round(iters * b / dt, 1),
        "unit": "synthesized (input+target) segment pairs/sec/chip (B=128)",
    }


def chamfer_microbench(iters: int = 100) -> dict:
    """The reference's own Chamfer micro-benchmark config:
    (32, 16384, 3) x (32, 1024, 3), 100 iterations
    (tf_ops/nn_distance/tf_nndistance.py:47-66 — it records no result)."""
    import jax
    import jax.numpy as jnp

    from cloudaae_tpu.ops import nn_distance

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 16384, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(32, 1024, 3)).astype(np.float32))

    @jax.jit
    def fn(x, y):
        d1, _, d2, _ = nn_distance(x, y)
        return jnp.sum(d1) + jnp.sum(d2)

    float(np.asarray(fn(x, y)))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(x, y)
    float(np.asarray(acc))
    dt = time.perf_counter() - t0
    return {
        "metric": "chamfer_microbench_ms",
        "value": round(dt / iters * 1000, 2),
        "unit": "ms/iter at the reference harness config (32,16384,3)x(32,1024,3)",
    }


def main():
    # 1. headline (runs in this process's TPU context)
    import bench

    bench.main()
    # 2. synthesis-only
    print(json.dumps(synth_bench()))
    # 3. inference
    from cloudaae_tpu.infer import bench as infer_bench

    print(json.dumps(infer_bench()))
    # 4. the reference's own chamfer micro-bench config
    print(json.dumps(chamfer_microbench()))


if __name__ == "__main__":
    main()
