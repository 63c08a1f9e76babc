"""Inference API tests."""

import numpy as np

import jax
import jax.numpy as jnp

from cloudaae_tpu import so3
from cloudaae_tpu.config import Config, ModelConfig, SynthConfig, TrainConfig
from cloudaae_tpu.infer import Predictor
from cloudaae_tpu.parallel.train_step import create_train_state
from cloudaae_tpu.models import make_model


def tiny_cfg():
    return Config(
        synth=SynthConfig(num_model_points=128, num_input_points=32,
                          num_target_points=128, points_per_blob=25,
                          hpr_iters=4),
        model=ModelConfig(num_class=3, num_point=32, k_neighbor=4,
                          edge_conv_channels=(8, 8), agg_channels=32,
                          decoder_fc=(32,), head_fc=(16,)),
        train=TrainConfig(batch_size=4),
    )


def test_predictor_shapes_and_determinism():
    cfg = tiny_cfg()
    state = create_train_state(make_model(cfg.model), cfg, jax.random.key(0))
    pred = Predictor.from_state(state, cfg)
    rng = np.random.default_rng(0)
    segs = rng.normal(size=(4, 32, 3)).astype(np.float32) * 0.05
    segs[..., 2] += 0.7
    cls = np.array([0, 1, 2, 0], np.int32)
    R, t = pred(segs, cls)
    assert R.shape == (4, 3, 3) and t.shape == (4, 3)
    # valid rotations
    rtr = np.einsum("bij,bkj->bik", np.asarray(R), np.asarray(R))
    assert np.max(np.abs(rtr - np.eye(3))) < 1e-5
    R2, t2 = pred(segs, cls)
    assert np.allclose(np.asarray(R), np.asarray(R2))

    # translation prediction is (residual + segment mean): shifting the
    # segment shifts t by the same amount (translation invariance trick)
    shift = np.array([0.05, -0.02, 0.01], np.float32)
    R3, t3 = pred(segs + shift, cls)
    assert np.allclose(np.asarray(t3 - t), shift, atol=1e-4)
    assert np.allclose(np.asarray(R3), np.asarray(R), atol=1e-4)


def test_predictor_with_icp():
    cfg = tiny_cfg()
    rng = np.random.default_rng(1)
    models = []
    for i in range(3):
        d = rng.normal(size=(128, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        models.append(d * 0.05)
    obj_models = np.stack(models).astype(np.float32)
    state = create_train_state(make_model(cfg.model), cfg, jax.random.key(0))
    pred = Predictor.from_state(state, cfg, obj_models=obj_models)
    segs = (obj_models[:1, :32] + np.array([0, 0, 0.7], np.float32)).astype(np.float32)
    R, t = pred(segs, np.array([0], np.int32), icp=True)
    assert np.isfinite(np.asarray(t)).all()
