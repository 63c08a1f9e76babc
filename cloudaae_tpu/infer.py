"""Inference API: batched 6D pose prediction from depth segments.

The serving-side surface of the framework — what the reference exposes only
implicitly through its eval script's session (evaluate_cloudAAE_ycbv.py
graph between :423-450).  One jitted program maps (segments, class ids) to
(rotation matrices, translations, reconstructions); optional on-device ICP
refinement against the raw segment.

    predictor = Predictor.from_checkpoint(ckpt_dir)
    R, t = predictor(segments, class_ids)          # (B,3,3), (B,3)

``python -m cloudaae_tpu.infer --bench`` measures poses/sec/chip at the
reference inference config (256-point segments) — one of the BASELINE.json
headline configs.
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from cloudaae_tpu import checkpoint, so3
from cloudaae_tpu.config import Config
from cloudaae_tpu.models import CloudAAE, make_model
from cloudaae_tpu.ops import icp_point_to_point
from cloudaae_tpu.parallel.train_step import TrainState, create_train_state


@dataclasses.dataclass
class Predictor:
    model: CloudAAE
    variables: dict
    cfg: Config
    obj_models: np.ndarray | None = None  # needed only for ICP

    @classmethod
    def from_checkpoint(
        cls, ckpt_dir: str, cfg: Config | None = None, obj_models=None
    ) -> "Predictor":
        cfg = cfg or Config()
        model = make_model(cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0))
        state = checkpoint.restore(ckpt_dir, state)
        return cls(
            model=model,
            variables={"params": state.params, "batch_stats": state.batch_stats},
            cfg=cfg,
            obj_models=obj_models,
        )

    @classmethod
    def from_params(
        cls, npz_path: str, cfg: Config | None = None, obj_models=None
    ) -> "Predictor":
        """Load a deploy artifact written by ``checkpoint.export_params``
        (params + batch_stats only, no optimizer state)."""
        cfg = cfg or Config()
        params, batch_stats, _ = checkpoint.load_params(npz_path)
        return cls(
            model=make_model(cfg.model),
            variables={"params": params, "batch_stats": batch_stats},
            cfg=cfg,
            obj_models=obj_models,
        )

    @classmethod
    def from_state(cls, state: TrainState, cfg: Config, obj_models=None):
        return cls(
            model=make_model(cfg.model),
            variables={"params": state.params, "batch_stats": state.batch_stats},
            cfg=cfg,
            obj_models=obj_models,
        )

    def __post_init__(self):
        cfg = self.cfg

        @jax.jit
        def _predict(variables, segments, class_ids):
            mean = jnp.mean(segments, axis=1)
            onehot = jax.nn.one_hot(class_ids, cfg.model.num_class)
            net_in = jnp.concatenate(
                [
                    segments - mean[:, None],
                    jnp.broadcast_to(
                        onehot[:, None, :],
                        (*segments.shape[:2], cfg.model.num_class),
                    ),
                ],
                axis=-1,
            )
            recon_res, rot_raw, trans_res, _ = self.model.apply(
                variables, net_in
            )
            k_hyp = cfg.model.num_rot_hyp
            if k_hyp > 1:
                # confidence-selected hypothesis (trained against the
                # winner-take-all winner, parallel/train_step.py)
                hyps, conf = so3.split_hypotheses(
                    rot_raw, cfg.model.rot_rep_dim, k_hyp
                )
                R_all = so3.head_to_mat(hyps, cfg.model.rot_rep)
                sel = jnp.argmax(conf, axis=-1)
                R = jnp.take_along_axis(
                    R_all, sel[:, None, None, None], axis=1
                )[:, 0]
                rot_axag = so3.log_map(R)[0]
            else:
                R = so3.head_to_mat(rot_raw, cfg.model.rot_rep)
                rot_axag = (rot_raw if cfg.model.rot_rep == "axag"
                            else so3.log_map(R)[0])
            t = trans_res + mean
            recon = recon_res + mean[:, None]
            return R, t, rot_axag, recon

        self._predict = _predict

        @jax.jit
        def _predict_hyps(variables, segments, class_ids):
            mean = jnp.mean(segments, axis=1)
            onehot = jax.nn.one_hot(class_ids, cfg.model.num_class)
            net_in = jnp.concatenate(
                [
                    segments - mean[:, None],
                    jnp.broadcast_to(
                        onehot[:, None, :],
                        (*segments.shape[:2], cfg.model.num_class),
                    ),
                ],
                axis=-1,
            )
            _, rot_raw, trans_res, _ = self.model.apply(variables, net_in)
            hyps, conf = so3.split_hypotheses(
                rot_raw, cfg.model.rot_rep_dim, cfg.model.num_rot_hyp
            )
            R_all = so3.head_to_mat(hyps, cfg.model.rot_rep)  # (B, k, 3, 3)
            return R_all, jax.nn.softmax(conf, axis=-1), trans_res + mean

        self._predict_hyps = _predict_hyps
        if self.obj_models is not None:
            models = np.asarray(self.obj_models[..., :3], np.float32)

            @jax.jit
            def _refine(variables, segments, class_ids, R, t):
                def one(seg, cls, R1, t1):
                    mdl = jnp.asarray(models)[cls]
                    return icp_point_to_point(
                        mdl, seg, R1, t1,
                        stages=cfg.eval.icp_iterations,
                        initial_radius=cfg.eval.icp_initial_radius,
                        radius_decay=cfg.eval.icp_radius_decay,
                    )

                return jax.vmap(one)(segments, class_ids, R, t)

            self._refine = _refine
        else:
            self._refine = None

    def __call__(
        self,
        segments: np.ndarray,
        class_ids: np.ndarray,
        icp: bool = False,
    ):
        """(B, N, 3) segments + (B,) class ids -> ((B,3,3) R, (B,3) t)."""
        R, t, _, _ = self._predict(
            self.variables, jnp.asarray(segments), jnp.asarray(class_ids)
        )
        if icp:
            if self._refine is None:
                raise ValueError("ICP refinement requires obj_models")
            R, t = self._refine(
                self.variables, jnp.asarray(segments),
                jnp.asarray(class_ids), R, t,
            )
        return R, t

    def predict_full(self, segments, class_ids):
        """Also return the axis-angle and the reconstructed clean segment."""
        return self._predict(
            self.variables, jnp.asarray(segments), jnp.asarray(class_ids)
        )

    def predict_hypotheses(self, segments, class_ids):
        """All k rotation hypotheses with their confidences.

        (B, N, 3) segments + (B,) class ids ->
        ((B, k, 3, 3) rotations, (B, k) softmax confidences, (B, 3) t).
        ``self(segments, class_ids)`` returns exactly the confidence-argmax
        row of this output (docs/MULTIHYP.md: selection at inference); the
        full set serves downstream selectors with better evidence — e.g.
        evaluate.make_eval_forward scores every hypothesis with the trimmed
        segment alignment residual under the ICP gate.  For k = 1 the
        confidence is identically 1.
        """
        return self._predict_hyps(
            self.variables, jnp.asarray(segments), jnp.asarray(class_ids)
        )


def bench(batch_size: int = 128, iters: int = 50) -> dict:
    """poses/sec/chip at the 256-point inference config."""
    cfg = Config()
    model = make_model(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0))
    pred = Predictor.from_state(state, cfg)
    rng = np.random.default_rng(0)
    segs = jnp.asarray(
        rng.normal(size=(batch_size, cfg.model.num_point, 3)).astype(np.float32)
        * 0.05
        + np.array([0, 0, 0.7], np.float32)
    )
    cls = jnp.asarray(rng.integers(0, cfg.model.num_class, batch_size), jnp.int32)
    R, t = pred(segs, cls)
    float(np.asarray(t).sum())  # barrier (see bench.py note)
    t0 = time.perf_counter()
    for _ in range(iters):
        R, t = pred(segs, cls)
    float(np.asarray(t).sum())
    dt = time.perf_counter() - t0
    return {
        "metric": "inference_poses_per_sec",
        "value": round(iters * batch_size / dt, 1),
        "unit": f"poses/sec/chip (B={batch_size}, N={cfg.model.num_point})",
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bench", action="store_true")
    p.add_argument("--batch-size", type=int, default=128)
    args = p.parse_args(argv)
    if args.bench:
        import json

        print(json.dumps(bench(args.batch_size)))


if __name__ == "__main__":
    main()
