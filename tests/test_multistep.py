"""Multi-step dispatch equivalence (parallel.make_train_multistep_from_table).

K steps fused into one device program must produce the same training
trajectory as K single-step dispatches: the per-step PRNG key derives
from the step counter (fold_in(key, state.step)), so the fused scan
consumes identical batches, keys, and BN schedules.
"""

import dataclasses

import jax
import numpy as np

from cloudaae_tpu.config import Config, ModelConfig, SynthConfig, TrainConfig
from cloudaae_tpu.models import make_model
from cloudaae_tpu.parallel import (
    create_train_state,
    make_train_multistep_from_table,
    make_train_step_from_table,
)


def _tiny_cfg() -> Config:
    return Config(
        synth=SynthConfig(
            num_model_points=256,
            num_input_points=64,
            num_target_points=256,  # = num_point * recon_multiplier
            hpr_iters=3,
        ),
        model=ModelConfig(
            num_class=3,
            num_point=64,
            edge_conv_channels=(8, 8),
            agg_channels=16,
            decoder_fc=(16,),
            head_fc=(8,),
            compute_dtype="float32",
        ),
        train=TrainConfig(batch_size=4),
    )


def test_multistep_matches_single_steps():
    cfg = _tiny_cfg()
    rng = np.random.default_rng(0)
    obj = rng.normal(0, 0.05, (3, 256, 3)).astype(np.float32)
    model = make_model(cfg.model)
    key = jax.random.key(5)

    n = cfg.train.batch_size * 4
    table = jax.device_put(
        (
            np.concatenate(
                [rng.normal(0, 0.04, (n, 2)), rng.uniform(0.6, 0.9, (n, 1))],
                axis=1,
            ).astype(np.float32),
            rng.normal(0, 1.2, (n, 3)).astype(np.float32),
            rng.integers(0, 3, n).astype(np.int32),
        )
    )

    single = make_train_step_from_table(model, cfg, obj)
    multi = make_train_multistep_from_table(model, cfg, obj, steps_per_call=4)

    s1 = create_train_state(model, cfg, jax.random.key(0))
    for i in range(4):
        s1, m1 = single(
            s1, table, np.asarray(i * cfg.train.batch_size, np.int32), key
        )

    s2 = create_train_state(model, cfg, jax.random.key(0))
    s2, m2 = multi(s2, table, np.asarray(0, np.int32), key)

    assert int(s1.step) == int(s2.step) == 4
    # identical trajectories: same params bit pattern (same program order
    # per step; CPU math is deterministic)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )
    # last-step metrics agree
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=2e-4
    )
