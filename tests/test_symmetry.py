"""Tests for symmetry detection and the symmetry-aware rotation loss.

The detector replaces hand-coded per-class symmetry tables: it must find
the D2 flips of a rectangular box, (a discretization of) the continuous
axial symmetry of a cylinder, and nothing but the identity for an
asymmetric surface.  The min-over-group error must vanish for any
group-equivalent pose and reduce to the plain geodesic for the identity
table.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudaae_tpu import so3, symmetry


def _box(n=2048, dims=(0.06, 0.10, 0.20), seed=0):
    """Points on the surface of an axis-aligned box with distinct dims."""
    rng = np.random.default_rng(seed)
    # sample faces proportionally to area
    a, b, c = dims
    areas = np.array([b * c, b * c, a * c, a * c, a * b, a * b])
    face = rng.choice(6, size=n, p=areas / areas.sum())
    u, v = rng.uniform(-0.5, 0.5, (2, n))
    pts = np.empty((n, 3), np.float32)
    half = np.array(dims) / 2
    for i in range(n):
        f = face[i]
        axis = f // 2
        sign = 1.0 if f % 2 == 0 else -1.0
        p = np.empty(3)
        p[axis] = sign * half[axis]
        others = [j for j in range(3) if j != axis]
        p[others[0]] = u[i] * dims[others[0]]
        p[others[1]] = v[i] * dims[others[1]]
        pts[i] = p
    return pts


def _cylinder(n=2048, radius=0.04, height=0.14, seed=0):
    rng = np.random.default_rng(seed)
    # lateral surface + caps, area-weighted
    lat = 2 * np.pi * radius * height
    cap = np.pi * radius**2
    which = rng.choice(3, size=n, p=np.array([lat, cap, cap]) / (lat + 2 * cap))
    theta = rng.uniform(0, 2 * np.pi, n)
    pts = np.empty((n, 3), np.float32)
    for i in range(n):
        if which[i] == 0:
            z = rng.uniform(-height / 2, height / 2)
            pts[i] = [radius * np.cos(theta[i]), radius * np.sin(theta[i]), z]
        else:
            r = radius * np.sqrt(rng.uniform())
            z = height / 2 if which[i] == 1 else -height / 2
            pts[i] = [r * np.cos(theta[i]), r * np.sin(theta[i]), z]
    return pts


def _tetra(n=2048, seed=3):
    """Asymmetric *surface*: an irregular tetrahedron.

    (A volumetric Gaussian blob is a bad "asymmetric" fixture: at finite
    sampling resolution a flipped Gaussian cloud is statistically within
    one NN-spacing of itself, i.e. genuinely indistinguishable — which the
    detector correctly accepts.  A scalene tetrahedron's asymmetry is
    geometric: any non-identity rotation displaces some face by a fixed
    fraction of its size, independent of how densely it is sampled.)
    """
    rng = np.random.default_rng(seed)
    v = np.array(
        [[0.0, 0.0, 0.0], [0.12, 0.0, 0.0], [0.03, 0.09, 0.0],
         [0.05, 0.02, 0.15]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    tri = v[faces]  # (4, 3, 3)
    areas = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1)
    f = rng.choice(4, size=n, p=areas / areas.sum())
    r1, r2 = rng.uniform(size=(2, n))
    s = np.sqrt(r1)
    a, b, c = tri[f, 0], tri[f, 1], tri[f, 2]
    pts = (1 - s)[:, None] * a + (s * (1 - r2))[:, None] * b \
        + (s * r2)[:, None] * c
    return pts.astype(np.float32)


class TestDetect:
    def test_box_finds_d2(self):
        table = symmetry.detect_symmetries(_box())
        n_sym = int(symmetry.num_symmetries(table[None])[0])
        # D2 = identity + three 180-degree flips
        assert n_sym == 4
        # every detected rotation maps the box onto itself: angle about some
        # principal axis must be ~pi for the non-identity entries (ICP
        # refinement converges to the sampling-noise optimum, a couple of
        # degrees off the exact flip for a randomly sampled surface)
        for R in np.asarray(table):
            if np.allclose(R, np.eye(3), atol=1e-5):
                continue
            ang = np.degrees(
                np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
            )
            assert ang == pytest.approx(180.0, abs=3.0)

    def test_cylinder_fills_table(self):
        table = symmetry.detect_symmetries(_cylinder())
        n_sym = int(symmetry.num_symmetries(table[None])[0])
        # continuous symmetry: all candidates about the cylinder axis pass
        # (15 of them at num_angles=16) and the 180-degree transverse flips
        assert n_sym >= 15

    def test_tetra_identity_only(self):
        table = symmetry.detect_symmetries(_tetra())
        assert int(symmetry.num_symmetries(table[None])[0]) == 1
        assert np.allclose(table, np.eye(3), atol=1e-6)

    def test_table_shape_and_padding(self):
        table = symmetry.detect_symmetries(_tetra(), max_syms=8)
        assert table.shape == (8, 3, 3)
        assert np.allclose(table[1:], np.eye(3), atol=1e-6)


class TestRotationErrorSym:
    def test_reduces_to_plain_geodesic_with_identity_table(self):
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.normal(0, 1, (16, 3)).astype(np.float32))
        gt = jnp.asarray(rng.normal(0, 1, (16, 3)).astype(np.float32))
        eye = jnp.broadcast_to(jnp.eye(3), (16, 4, 3, 3))
        mean_sym, per_sym = symmetry.rotation_error_sym(pred, gt, eye)
        mean_plain, per_plain = so3.rotation_error(pred, gt)
        np.testing.assert_allclose(
            np.asarray(per_sym), np.asarray(per_plain), atol=1e-5
        )
        assert float(mean_sym) == pytest.approx(float(mean_plain), abs=1e-5)

    def test_zero_error_for_group_equivalent_pose(self):
        # gt rotated by a group element must cost ~0
        rng = np.random.default_rng(1)
        gt = jnp.asarray(rng.normal(0, 1, (8, 3)).astype(np.float32))
        R_gt = so3.exp_map(gt)
        flip = so3.exp_map(jnp.asarray([np.pi, 0.0, 0.0], jnp.float32))
        syms = jnp.stack([jnp.eye(3), flip])  # group {I, Rx(pi)}
        syms = jnp.broadcast_to(syms, (8, 2, 3, 3))
        # prediction = gt composed with the flip (object-frame: R_gt @ S)
        pred_R = jnp.einsum("bij,jk->bik", R_gt, flip)
        pred_axag, _ = so3.log_map(pred_R)
        _, per = symmetry.rotation_error_sym(pred_axag, gt, syms)
        assert float(jnp.max(per)) < 1e-2
        # while the plain geodesic sees the full pi flip
        _, per_plain = so3.rotation_error(pred_axag, gt)
        assert float(jnp.min(per_plain)) > 3.0

    def test_never_exceeds_plain_error(self):
        rng = np.random.default_rng(2)
        pred = jnp.asarray(rng.normal(0, 1, (32, 3)).astype(np.float32))
        gt = jnp.asarray(rng.normal(0, 1, (32, 3)).astype(np.float32))
        flip = so3.exp_map(jnp.asarray([0.0, np.pi, 0.0], jnp.float32))
        syms = jnp.broadcast_to(
            jnp.stack([jnp.eye(3), flip]), (32, 2, 3, 3)
        )
        _, per_sym = symmetry.rotation_error_sym(pred, gt, syms)
        _, per_plain = so3.rotation_error(pred, gt)
        assert np.all(np.asarray(per_sym) <= np.asarray(per_plain) + 1e-5)

    def test_grad_flows_under_jit(self):
        flip = so3.exp_map(jnp.asarray([np.pi, 0.0, 0.0], jnp.float32))
        syms = jnp.broadcast_to(jnp.stack([jnp.eye(3), flip]), (4, 2, 3, 3))
        gt = jnp.asarray(
            np.random.default_rng(4).normal(0, 1, (4, 3)).astype(np.float32)
        )

        @jax.jit
        def loss(p):
            m, _ = symmetry.rotation_error_sym(p, gt, syms)
            return m

        g = jax.grad(loss)(gt + 0.3)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0.0


class TestTrainStepIntegration:
    def test_sym_loss_in_train_step(self):
        """A train step built with rot_sym=True runs and reports both the
        plain and the symmetry-aware rotation metrics."""
        import dataclasses

        from cloudaae_tpu.config import Config
        from cloudaae_tpu.models import make_model
        from cloudaae_tpu.parallel import create_train_state, make_train_step

        cfg = Config()
        cfg = dataclasses.replace(
            cfg,
            loss=dataclasses.replace(cfg.loss, rot_sym=True, sym_angles=8),
            train=dataclasses.replace(cfg.train, batch_size=4),
            synth=dataclasses.replace(
                cfg.synth,
                num_model_points=128,
                num_input_points=32,
                num_target_points=128,
                points_per_blob=16,
                hpr_iters=2,
            ),
            model=dataclasses.replace(
                cfg.model,
                num_point=32,
                num_class=3,
                edge_conv_channels=(8, 8),
                agg_channels=16,
                decoder_fc=(16,),
                head_fc=(8,),
            ),
        )
        rng = np.random.default_rng(0)
        # class 0: box (D2), class 1: tetra, class 2: another tetra
        models = np.stack(
            [_box(128), _tetra(128, seed=5), _tetra(128, seed=6)]
        )
        model = make_model(cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0))
        step = make_train_step(model, cfg, jnp.asarray(models))
        batch = (
            jnp.asarray(rng.normal(0, 0.05, (4, 3)).astype(np.float32))
            + jnp.asarray([0.0, 0.0, 0.7], jnp.float32),
            jnp.asarray(rng.normal(0, 1, (4, 3)).astype(np.float32)),
            jnp.asarray([0, 1, 2, 0], jnp.int32),
        )
        new_state, m = step(state, batch, jax.random.key(1))
        assert "axag_sym_loss" in m
        assert np.isfinite(float(m["axag_sym_loss"]))
        assert float(m["axag_sym_loss"]) <= float(m["axag_loss"]) + 1e-4
        assert int(new_state.step) == 1
