"""Core-op tests against numpy/scipy brute-force oracles.

The oracle pattern follows the reference's only real numeric cross-check
(tf_ops/nn_distance/tf_nndistance_cpu.py:28-45: pure-TF Chamfer vs an
explicit numpy double loop), extended to every op in SURVEY.md §2.10.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cloudaae_tpu import ops


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------- chamfer


def brute_nn(x, y):
    d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return d.min(1), d.argmin(1), d.min(0), d.argmin(0)


def test_nn_distance_matches_bruteforce(rng):
    x = rng.normal(size=(3, 256, 3)).astype(np.float32)
    y = rng.normal(size=(3, 512, 3)).astype(np.float32)
    d1, i1, d2, i2 = ops.nn_distance(jnp.asarray(x), jnp.asarray(y))
    for b in range(3):
        bd1, bi1, bd2, bi2 = brute_nn(x[b], y[b])
        assert np.allclose(np.asarray(d1[b]), bd1, atol=1e-4)
        assert np.array_equal(np.asarray(i1[b]), bi1)
        assert np.allclose(np.asarray(d2[b]), bd2, atol=1e-4)
        assert np.array_equal(np.asarray(i2[b]), bi2)


def test_nn_distance_chunked_path(rng):
    # N > chunk size exercises the lax.map tiling
    x = rng.normal(size=(1024, 3)).astype(np.float32)
    y = rng.normal(size=(512, 3)).astype(np.float32)
    d1, i1, d2, i2 = ops.nn_distance(jnp.asarray(x), jnp.asarray(y))
    bd1, bi1, bd2, bi2 = brute_nn(x, y)
    assert np.allclose(np.asarray(d1), bd1, atol=1e-4)
    assert np.array_equal(np.asarray(i1), bi1)


def test_chamfer_gradient_matches_finite_difference(rng):
    x = rng.normal(size=(32, 3)).astype(np.float64)
    y = rng.normal(size=(32, 3)).astype(np.float64)

    def loss(x_, y_):
        return ops.chamfer_loss(x_, y_)[0]

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    eps = 1e-4
    base = float(loss(jnp.asarray(x), jnp.asarray(y)))
    for arr, garr, which in [(x, g[0], 0), (y, g[1], 1)]:
        for probe in [(0, 0), (5, 1), (20, 2)]:
            pert = arr.copy()
            pert[probe] += eps
            args = [x.copy(), y.copy()]
            args[which] = pert
            num = (float(loss(jnp.asarray(args[0]), jnp.asarray(args[1]))) - base) / eps
            assert abs(num - float(garr[probe])) < 1e-2


def test_nn_distance_arbitrary_point_counts(rng):
    # non-multiple-of-chunk N and M exercise the pad-and-mask path
    for n, m in [(100, 37), (300, 129), (7, 1000)]:
        x = rng.normal(size=(2, n, 3)).astype(np.float32)
        y = rng.normal(size=(2, m, 3)).astype(np.float32)
        d1, i1, d2, i2 = ops.nn_distance(jnp.asarray(x), jnp.asarray(y))
        assert d1.shape == (2, n) and d2.shape == (2, m)
        for b in range(2):
            bd1, bi1, bd2, bi2 = brute_nn(x[b], y[b])
            assert np.allclose(np.asarray(d1[b]), bd1, atol=1e-4)
            assert np.array_equal(np.asarray(i1[b]), bi1)
            assert np.allclose(np.asarray(d2[b]), bd2, atol=1e-4)
            assert np.array_equal(np.asarray(i2[b]), bi2)


def test_chamfer_pallas_kernel_parity(rng):
    # the fused TPU kernel (interpret mode on CPU) vs the brute-force oracle,
    # including masked pad columns (m_actual < padded M)
    from cloudaae_tpu.ops.chamfer_pallas import nn_min_argmin_pallas

    n, m, m_pad = 256, 200, 256
    x = rng.normal(size=(2, n, 3)).astype(np.float32)
    y = rng.normal(size=(2, m, 3)).astype(np.float32)
    y_pad = np.zeros((2, m_pad, 3), np.float32)
    y_pad[:, :m] = y
    dist, idx, nn = nn_min_argmin_pallas(
        jnp.asarray(x), jnp.asarray(y_pad), m_actual=m, interpret=True
    )
    for b in range(2):
        bd1, bi1, _, _ = brute_nn(x[b], y[b])
        assert np.allclose(np.asarray(dist[b]), bd1, atol=1e-4)
        assert np.array_equal(np.asarray(idx[b]), bi1)
        assert np.allclose(np.asarray(nn[b]), y[b][bi1], atol=1e-6)


def test_chamfer_scatter_pallas_kernel_parity(rng):
    from cloudaae_tpu.ops.chamfer_pallas import scatter_add_rows_pallas

    k, n_rows = 300, 200  # non-multiples exercise row padding
    idx = rng.integers(0, n_rows, size=(2, k)).astype(np.int32)
    upd = rng.normal(size=(2, k, 3)).astype(np.float32)
    out = scatter_add_rows_pallas(
        jnp.asarray(idx), jnp.asarray(upd), n_rows, interpret=True
    )
    for b in range(2):
        ref = np.zeros((n_rows, 3), np.float32)
        np.add.at(ref, idx[b], upd[b])
        assert np.allclose(np.asarray(out[b]), ref, atol=1e-5)


def test_chamfer_zero_for_identical_clouds(rng):
    x = rng.normal(size=(2, 64, 3)).astype(np.float32)
    loss, per = ops.chamfer_loss(jnp.asarray(x), jnp.asarray(x))
    # the |x|^2 - 2xy + |y|^2 formulation carries ~eps*|x|^2 cancellation
    # noise at zero distance (the direct-difference CUDA kernel is exact
    # there); 1e-5 in squared meters = 3mm false floor, fine for the loss
    assert float(loss) < 1e-5
    assert per.shape == (2, 64)


# ------------------------------------------------------------------- fps


def np_fps(pts, k, start=0):
    idx = np.zeros(k, np.int64)
    idx[0] = start
    d = ((pts - pts[start]) ** 2).sum(-1)
    for i in range(1, k):
        idx[i] = d.argmax()
        d = np.minimum(d, ((pts - pts[idx[i]]) ** 2).sum(-1))
    return idx


def test_fps_matches_numpy_oracle(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    got = np.asarray(ops.farthest_point_sample(16, jnp.asarray(pts)))
    want = np_fps(pts, 16)
    assert np.array_equal(got, want)


def test_fps_batched_and_spread(rng):
    pts = rng.normal(size=(4, 300, 3)).astype(np.float32)
    idx = np.asarray(ops.farthest_point_sample(32, jnp.asarray(pts)))
    assert idx.shape == (4, 32)
    for b in range(4):
        assert len(np.unique(idx[b])) == 32  # FPS never repeats while K < N


def test_fps_random_start(rng):
    pts = rng.normal(size=(2, 100, 3)).astype(np.float32)
    idx = ops.farthest_point_sample(8, jnp.asarray(pts), key=jax.random.key(1))
    assert idx.shape == (2, 8)


# ---------------------------------------------------------------- gather


def test_gather_point(rng):
    pts = rng.normal(size=(2, 50, 3)).astype(np.float32)
    idx = rng.integers(0, 50, size=(2, 7)).astype(np.int32)
    out = np.asarray(ops.gather_point(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        assert np.array_equal(out[b], pts[b, idx[b]])


def test_gather_point_gradient_is_scatter_add(rng):
    pts = jnp.asarray(rng.normal(size=(1, 5, 3)).astype(np.float32))
    idx = jnp.asarray([[1, 1, 3]], dtype=jnp.int32)

    def f(p):
        return jnp.sum(ops.gather_point(p, idx))

    g = np.asarray(jax.grad(f)(pts))[0]
    assert np.allclose(g[:, 0], [0, 2, 0, 1, 0])  # index 1 hit twice


def test_prob_sample_statistics(rng):
    probs = jnp.asarray([[0.1, 0.0, 0.6, 0.3]], dtype=jnp.float32)
    u = jax.random.uniform(jax.random.key(0), (1, 20000))
    idx = np.asarray(ops.prob_sample(probs, u))[0]
    freq = np.bincount(idx, minlength=4) / idx.size
    assert np.allclose(freq, [0.1, 0.0, 0.6, 0.3], atol=0.02)


# ------------------------------------------------------------------- knn


def test_pairwise_sq_dist_and_knn(rng):
    pts = rng.normal(size=(2, 40, 5)).astype(np.float32)  # extra channels
    d = np.asarray(ops.pairwise_sq_dist(jnp.asarray(pts)))
    want = ((pts[:, :, None, :3] - pts[:, None, :, :3]) ** 2).sum(-1)
    assert np.max(np.abs(d - want)) < 1e-4

    k = 5
    idx = np.asarray(ops.knn_indices(jnp.asarray(d), k))
    for b in range(2):
        for i in range(40):
            got = set(idx[b, i].tolist())
            want_i = set(np.argsort(want[b, i])[:k].tolist())
            assert got == want_i


def test_edge_feature(rng):
    pts = rng.normal(size=(1, 10, 4)).astype(np.float32)
    d = ops.pairwise_sq_dist(jnp.asarray(pts))
    idx = ops.knn_indices(d, 3)
    ef = np.asarray(ops.edge_feature(jnp.asarray(pts), idx))
    assert ef.shape == (1, 10, 3, 8)
    i_np = np.asarray(idx)
    for n in range(10):
        for j in range(3):
            center = pts[0, n]
            nbr = pts[0, i_np[0, n, j]]
            assert np.allclose(ef[0, n, j, :4], center, atol=1e-6)
            assert np.allclose(ef[0, n, j, 4:], nbr - center, atol=1e-6)
    # self is always the nearest neighbor -> first edge diff is zero
    assert np.allclose(ef[:, :, 0, 4:], 0.0, atol=1e-6)


# --------------------------------------------------------------- outlier


def test_radius_outlier_mask(rng):
    cluster = rng.normal(size=(100, 3)).astype(np.float32) * 0.01
    stray = np.array([[10.0, 0, 0], [0, 10, 0]], np.float32)
    pts = np.concatenate([cluster, stray])
    mask = np.asarray(ops.radius_outlier_mask(jnp.asarray(pts), 10, 0.1))
    assert mask[:100].all()
    assert not mask[100:].any()


# ------------------------------------------------------------------- icp


def test_icp_recovers_small_perturbation(rng):
    from cloudaae_tpu import so3

    model = rng.normal(size=(256, 3)).astype(np.float32) * 0.05
    axag_true = np.array([0.3, -0.2, 0.5], np.float32)
    t_true = np.array([0.02, -0.01, 0.6], np.float32)
    R_true = np.asarray(so3.exp_map(jnp.asarray(axag_true)))
    segment = model @ R_true.T + t_true

    # perturb the initial pose slightly
    axag_init = axag_true + np.array([0.03, -0.02, 0.02], np.float32)
    t_init = t_true + np.array([0.004, 0.003, -0.005], np.float32)
    R_init = jnp.asarray(so3.exp_map(jnp.asarray(axag_init)))

    R_ref, t_ref = ops.icp_point_to_point(
        jnp.asarray(model), jnp.asarray(segment), R_init, jnp.asarray(t_init),
        stages=10, iters_per_stage=5, initial_radius=0.02,
    )
    rot_err = float(so3.geodesic_angle(R_ref, jnp.asarray(R_true)))
    t_err = float(jnp.linalg.norm(t_ref - t_true))
    init_rot_err = float(so3.geodesic_angle(R_init, jnp.asarray(R_true)))
    assert rot_err < init_rot_err * 0.2
    assert t_err < 0.002


# ------------------------------------------------------------ mesh sample


def test_sample_mesh_surface_uniformity(rng):
    from cloudaae_tpu.ops import sample_mesh_surface, triangle_areas

    # two triangles: one 4x the area of the other
    verts = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [3, 0, 0], [1, 2, 0]],
        jnp.float32,
    )
    tris = jnp.asarray([[0, 1, 2], [1, 3, 4]], jnp.int32)
    areas = np.asarray(triangle_areas(verts, tris))
    assert abs(areas[1] / areas[0] - 4.0) < 1e-5

    pts = np.asarray(sample_mesh_surface(verts, tris, 20000, jax.random.key(0)))
    assert pts.shape == (20000, 3)
    assert np.allclose(pts[:, 2], 0.0, atol=1e-6)  # mesh is planar
    # fraction of samples on the big triangle ~ 0.8
    on_big = pts[:, 0] > 1.0  # right of x=1 only reachable on triangle 2
    frac = on_big.mean()
    assert 0.3 < frac < 0.8  # loose: x>1 covers part of the big triangle
    # barycentric validity: all points inside the union's bounding box
    assert pts[:, 0].min() >= -1e-6 and pts[:, 0].max() <= 3 + 1e-6


def test_knn_approx_recall(rng):
    """approx_max_k kNN must hit >= its recall target vs exact top-k."""
    from cloudaae_tpu.ops.knn import knn_indices, pairwise_sq_dist

    x = jnp.asarray(rng.normal(size=(4, 256, 3)).astype(np.float32))
    d = pairwise_sq_dist(x)
    exact = np.asarray(knn_indices(d, 10))
    approx = np.asarray(knn_indices(d, 10, approx_recall=0.95))
    assert approx.shape == exact.shape
    recall = np.mean([
        len(set(exact[b, i]) & set(approx[b, i])) / 10.0
        for b in range(4) for i in range(256)
    ])
    assert recall >= 0.95, recall
