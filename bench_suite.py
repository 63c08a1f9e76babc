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


# Public per-chip peak numbers (bf16 FLOP/s, HBM bytes/s) by device kind.
# mfu_bench resolves the running backend's entry (ADVICE r4: hardcoding
# v5e made the fractions silently wrong on any other backend) and labels
# the output with the chip it assumed; unknown kinds report raw
# FLOPs/bytes with null utilization fractions instead of wrong ones.
_CHIP_PEAKS = {
    # jax device_kind substrings -> (peak bf16 FLOP/s, peak HBM B/s)
    "v5 lite": (197e12, 819e9),   # TPU v5e
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6 lite": (918e12, 1640e9),  # TPU v6e (Trillium)
    "v6e": (918e12, 1640e9),
}


def _device_peaks() -> tuple[str, float | None, float | None]:
    """(device_kind, peak bf16 FLOP/s, peak HBM B/s) for jax.devices()[0]."""
    import jax

    kind = jax.devices()[0].device_kind
    low = kind.lower()
    for frag, (flops, bw) in _CHIP_PEAKS.items():
        if frag in low:
            return kind, flops, bw
    return kind, None, None


def mfu_bench(iters: int = 20) -> dict:
    """Roofline placement of the fused train step: measured FLOP/s and
    HBM bytes/s against the chip's peaks.

    FLOPs and bytes come from XLA's own cost model for the compiled step
    (``compiled.cost_analysis()``), time from the same honest-barrier
    timing bench.py uses.  The point (VERDICT r3): the workload is
    geometry-bound — O(N^2) VPU-heavy pairwise work (HPR support
    iterations, chamfer min-reductions, kNN) with only ~7M-param dense
    layers feeding the MXU — so samples/sec, not MFU, is the honest
    headline; this metric *measures* that claim instead of asserting it.
    """
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
    obj = load_object_models(
        "/root/reference/object_model_tfrecord/obj_models.tfrecords"
    )
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    mesh = make_mesh(dp=-1, tp=1)
    step_fn = make_train_step_from_table(model, cfg, obj, mesh)

    rng = np.random.default_rng(0)
    b = cfg.train.batch_size
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

    flops = bytes_accessed = None
    try:
        lowered = jax.jit(step_fn, donate_argnums=()).lower(
            state, table, np.asarray(0, np.int32), key
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
        bytes_accessed = float(cost.get("bytes accessed", float("nan")))
    except Exception as e:  # cost model unavailable on some backends
        print(json.dumps({"metric": "train_step_mfu", "error": str(e)[:200]}))

    for i in range(3):
        state, m = step_fn(state, table, np.asarray(i * b, np.int32), key)
    float(np.asarray(m["total_loss"]))
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step_fn(state, table, np.asarray(i * b, np.int32), key)
    float(np.asarray(m["total_loss"]))
    dt = (time.perf_counter() - t0) / iters

    kind, peak_flops, peak_bw = _device_peaks()
    out = {
        "metric": "train_step_mfu",
        "value": (
            round(flops / dt / peak_flops, 4)
            if flops and np.isfinite(flops) and peak_flops else None
        ),
        "unit": (
            f"fraction of {kind} bf16 peak "
            f"({(peak_flops or 0) / 1e12:.0f} TFLOP/s, XLA cost model)"
            if peak_flops else
            f"unknown device kind {kind!r}: raw FLOPs/bytes only"
        ),
        "device_kind": kind,
        "step_ms": round(dt * 1000, 2),
        "flops_per_step": flops,
        "bytes_per_step": bytes_accessed,
        "hbm_bw_util": (
            round(bytes_accessed / dt / peak_bw, 4)
            if bytes_accessed and np.isfinite(bytes_accessed) and peak_bw
            else None
        ),
    }
    if out["value"] is not None and out["hbm_bw_util"] is not None:
        out["bound"] = (
            "compute" if out["value"] > out["hbm_bw_util"] else "memory"
        )
        if max(out["value"], out["hbm_bw_util"]) < 0.3:
            # neither roofline wall is near: serial/VPU/latency-limited —
            # the geometry kernels' O(N^2) VPU work doesn't count toward
            # MXU FLOPs, which is the measured "geometry-bound" claim
            out["bound"] += " (far from both walls: VPU/serial-limited)"
    return out


def batch_scaling_bench(
    batch_sizes: tuple[int, ...] = (128, 256, 512), iters: int = 20
) -> dict:
    """samples/sec of the fused train step across batch sizes.

    The round-4 roofline (mfu_bench) put the B=128 step far from both
    walls — VPU/serial-limited — which predicts super-linear samples/sec
    scaling with batch (VERDICT r4 #6).  The training recipe stays B=128
    for reference parity (train_cloudAAE_ycbv.py:448); this measures the
    capability headline (poses/sec/chip) and sizes future perf work.
    """
    import dataclasses

    import jax

    from cloudaae_tpu.config import Config
    from cloudaae_tpu.data import load_object_models
    from cloudaae_tpu.models import make_model
    from cloudaae_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step_from_table,
    )

    obj = load_object_models(
        "/root/reference/object_model_tfrecord/obj_models.tfrecords"
    )
    mesh = make_mesh(dp=-1, tp=1)
    rng = np.random.default_rng(0)
    points = []
    for b in batch_sizes:
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, batch_size=b)
        )
        model = make_model(cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0))
        step_fn = make_train_step_from_table(model, cfg, obj, mesh)
        n = b * (iters + 3)
        table = jax.device_put(
            (
                np.concatenate(
                    [rng.normal(0, 0.04, (n, 2)),
                     rng.uniform(0.6, 0.9, (n, 1))], axis=1,
                ).astype(np.float32),
                rng.normal(0, 1.2, (n, 3)).astype(np.float32),
                rng.integers(0, cfg.model.num_class, n).astype(np.int32),
            )
        )
        key = jax.random.key(1)
        for i in range(3):
            state, m = step_fn(state, table, np.asarray(i * b, np.int32), key)
        float(np.asarray(m["total_loss"]))  # honest barrier
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step_fn(
                state, table, np.asarray((3 + i) * b, np.int32), key
            )
        float(np.asarray(m["total_loss"]))
        dt = (time.perf_counter() - t0) / iters
        points.append(
            {"batch": b, "step_ms": round(dt * 1000, 2),
             "samples_per_sec": round(b / dt, 1)}
        )
        del state, table
    base = points[0]["samples_per_sec"]
    return {
        "metric": "batch_scaling",
        "value": points[-1]["samples_per_sec"],
        "unit": f"samples/sec at B={batch_sizes[-1]} "
                f"(x{points[-1]['samples_per_sec'] / base:.2f} vs B={batch_sizes[0]})",
        "points": points,
    }


def main():
    # 1. headline (runs in this process's TPU context)
    import bench

    bench.main()
    # 1b. roofline placement of the same step
    print(json.dumps(mfu_bench()))
    # 1c. batch-size scaling of the same step (VERDICT r4 #6)
    print(json.dumps(batch_scaling_bench()))
    # 2. synthesis-only
    print(json.dumps(synth_bench()))
    # 3. inference
    from cloudaae_tpu.infer import bench as infer_bench

    print(json.dumps(infer_bench()))
    # 4. the reference's own chamfer micro-bench config
    print(json.dumps(chamfer_microbench()))


if __name__ == "__main__":
    main()
