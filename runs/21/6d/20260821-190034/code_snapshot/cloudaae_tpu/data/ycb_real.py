"""YCB-Video real-frame records: parsing, segment extraction, fixtures.

Implements the "pcnn" full-frame schema the reference eval consumes
(evaluate_cloudAAE_ycbv.py:125-161): raw RGB image, uint16 depth, uint8
per-pixel label mask, per-class quaternions/translations, intrinsics —
files named ``{seq:04d}_pcnn.tfrecord`` per video sequence (:362-366).

The real tfrecords are a separate download absent from this mount
(BASELINE.md), so this module also provides :func:`render_frame` — a
z-buffer renderer that projects posed object models into synthetic
depth/label frames with the same schema.  It serves as the test fixture
generator for the full eval pipeline and as a standalone dataset tool.

Ragged-to-fixed: the reference's per-frame pipeline bounces through host
py_funcs with data-dependent shapes (SURVEY.md §3.2).  Here a frame decodes
on host to fixed-size arrays, and the entire segment-processing chain
(backprojection, masking, distance filter, outlier removal, FPS) is one
jitted function over fixed-capacity padded buffers (``eval_preprocess`` in
cloudaae_tpu.evaluate).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from cloudaae_tpu.data import tfrecord

# YCB-Video camera defaults (the real dataset's primary camera).
DEFAULT_INTRINSICS = dict(
    fx=1066.778, fy=1067.487, cx=312.9869, cy=241.3109, factor_depth=10000.0
)
FRAME_H, FRAME_W = 480, 640


@dataclass
class RealFrame:
    image: np.ndarray          # (H, W, 3) uint8
    depth: np.ndarray          # (H, W) uint16
    label: np.ndarray          # (H, W) uint8, 1-based class ids, 0 = bg
    quaternions: np.ndarray    # (num_class, 4) wxyz
    translations: np.ndarray   # (num_class, 3)
    class_one_hot: np.ndarray  # (num_class,) int64
    seq_id: int
    frame_id: int
    fx: float
    fy: float
    cx: float
    cy: float
    factor_depth: float


def parse_real_frame(payload: bytes, num_class: int = 21) -> RealFrame:
    """Decode one pcnn-schema record (evaluate_cloudAAE_ycbv.py:125-161)."""
    ex = tfrecord.parse_example(payload)
    img_shape = ex["image_shape"].int64_list
    image = np.frombuffer(ex["image"].bytes_list[0], np.uint8).reshape(img_shape)
    if image.shape[-1] == 4:  # 4-channel images occur in the real data (:150)
        image = image[..., :3]
    depth_shape = ex["depth_shape"].int64_list
    depth = np.frombuffer(ex["depth"].bytes_list[0], np.uint16).reshape(depth_shape)
    label_shape = ex["label_shape"].int64_list
    label = np.frombuffer(ex["label"].bytes_list[0], np.uint8).reshape(label_shape)
    return RealFrame(
        image=image,
        depth=depth,
        label=label,
        quaternions=ex["quaternions"].float_list.reshape(num_class, 4),
        translations=ex["translations"].float_list.reshape(num_class, 3),
        class_one_hot=ex["class_one_hot"].int64_list,
        seq_id=int(ex["seq_id"].int64_list[0]),
        frame_id=int(ex["frame_id"].int64_list[0]),
        fx=float(ex["fx"].float_list[0]),
        fy=float(ex["fy"].float_list[0]),
        cx=float(ex["cx"].float_list[0]),
        cy=float(ex["cy"].float_list[0]),
        factor_depth=float(ex["factor_depth"].float_list[0]),
    )


def frame_bytes(frame: RealFrame) -> bytes:
    """Serialize a RealFrame to the pcnn schema."""
    return tfrecord.example_bytes(
        {
            "image": frame.image.tobytes(),
            "image_shape": np.asarray(frame.image.shape, np.int64),
            "depth": frame.depth.tobytes(),
            "depth_shape": np.asarray(frame.depth.shape, np.int64),
            "label": frame.label.tobytes(),
            "label_shape": np.asarray(frame.label.shape, np.int64),
            "quaternions": frame.quaternions.astype(np.float32),
            "translations": frame.translations.astype(np.float32),
            "class_one_hot": np.asarray(frame.class_one_hot, np.int64),
            "seq_id": np.asarray([frame.seq_id], np.int64),
            "frame_id": np.asarray([frame.frame_id], np.int64),
            "fx": np.asarray([frame.fx], np.float32),
            "fy": np.asarray([frame.fy], np.float32),
            "cx": np.asarray([frame.cx], np.float32),
            "cy": np.asarray([frame.cy], np.float32),
            "factor_depth": np.asarray([frame.factor_depth], np.float32),
        }
    )


def iter_real_frames(path: str, num_class: int = 21):
    for payload in tfrecord.iter_tfrecord(path):
        yield parse_real_frame(payload, num_class)


# ------------------------------------------------- FPS1024 real records


def parse_fps_record(payload: bytes, total_num_point: int = 1024) -> dict:
    """Decode one pre-sampled real-segment record.

    The schema the shipped checkpoint was actually trained on
    (trained_network/.../train_6d_...compact.py:85-95, SURVEY.md §2.9):
    {xyz f32[P,3], rgb f32[P,3], translation f32[3], quaternion f32[4],
     num_valid_points_in_segment, seq_id, frame_id, class_id}.
    """
    ex = tfrecord.parse_example(payload)
    return {
        "xyz": ex["xyz"].float_list.reshape(total_num_point, 3),
        "rgb": ex["rgb"].float_list.reshape(total_num_point, 3),
        "translation": ex["translation"].float_list,
        "quaternion": ex["quaternion"].float_list,
        "num_valid_points_in_segment": int(
            ex["num_valid_points_in_segment"].int64_list[0]
        ),
        "seq_id": int(ex["seq_id"].int64_list[0]),
        "frame_id": int(ex["frame_id"].int64_list[0]),
        "class_id": int(ex["class_id"].int64_list[0]),
    }


def fps_record_bytes(rec: dict) -> bytes:
    return tfrecord.example_bytes(
        {
            "xyz": np.asarray(rec["xyz"], np.float32),
            "rgb": np.asarray(rec["rgb"], np.float32),
            "translation": np.asarray(rec["translation"], np.float32),
            "quaternion": np.asarray(rec["quaternion"], np.float32),
            "num_valid_points_in_segment": np.asarray(
                [rec["num_valid_points_in_segment"]], np.int64
            ),
            "seq_id": np.asarray([rec.get("seq_id", 0)], np.int64),
            "frame_id": np.asarray([rec.get("frame_id", 0)], np.int64),
            "class_id": np.asarray([rec["class_id"]], np.int64),
        }
    )


def load_fps_records(paths, total_num_point: int = 1024) -> dict:
    """Load FPS-presampled real records into stacked arrays for training."""
    xyz, trans, quat, cls = [], [], [], []
    for path in paths:
        for payload in tfrecord.iter_tfrecord(path):
            r = parse_fps_record(payload, total_num_point)
            xyz.append(r["xyz"])
            trans.append(r["translation"])
            quat.append(r["quaternion"])
            cls.append(r["class_id"])
    return {
        "xyz": np.stack(xyz).astype(np.float32),
        "translation": np.stack(trans).astype(np.float32),
        "quaternion": np.stack(quat).astype(np.float32),
        "class_id": np.asarray(cls, np.int32),
    }


# -------------------------------------------------------------- renderer


_DENSIFY_CACHE: dict = {}


def densify_point_cloud(
    points: np.ndarray,
    k: int = 8,
    samples_per_point: int = 24,
    seed: int = 0,
) -> np.ndarray:
    """Upsample a surface point cloud by local k-NN triangle interpolation.

    The 2048-point object models are far too sparse to z-buffer directly:
    at YCB camera distances neighboring points are ~9 px apart, so pixels
    between splats get won by *back-surface* points and the rendered depth
    becomes an impossible two-sided shell.  Sampling uniform barycentric
    points on pseudo-triangles (p, n_i, n_j) of each point's k nearest
    neighbors closes the surface (the pointcloud analogue of
    ops/mesh_sample.sample_mesh_surface, which needs a real mesh).

    Returns (N * (1 + samples_per_point), 3).
    """
    pts = np.asarray(points[:, :3], np.float64)
    n = len(pts)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    nn = np.argsort(d2, axis=1)[:, 1 : k + 1]  # (n, k) neighbor indices
    rng = np.random.default_rng(seed)
    base = np.repeat(np.arange(n), samples_per_point)
    j = rng.integers(0, k, (len(base), 2))
    p = pts[base]
    n1 = pts[nn[base, j[:, 0]]]
    n2 = pts[nn[base, j[:, 1]]]
    r = rng.random((len(base), 2))
    s = np.sqrt(r[:, :1])
    t = r[:, 1:]
    extra = (1 - s) * p + s * (1 - t) * n1 + s * t * n2
    return np.vstack([pts, extra]).astype(np.float32)


def _densified(obj_models: np.ndarray, cls: int, samples_per_point: int):
    key = (id(obj_models), cls, samples_per_point)
    if key not in _DENSIFY_CACHE:
        _DENSIFY_CACHE[key] = densify_point_cloud(
            obj_models[cls][:, :3], samples_per_point=samples_per_point,
            seed=1000 + cls,
        )
    return _DENSIFY_CACHE[key]


def render_frame(
    obj_models: np.ndarray,
    class_ids: list[int],
    rotations: np.ndarray,
    translations: np.ndarray,
    seq_id: int = 0,
    frame_id: int = 0,
    splat: int = 2,
    num_class: int = 21,
    rng: np.random.Generator | None = None,
    depth_noise: float = 0.0,
    cull_window: int = 5,
    cull_margin: float = 0.004,
    densify: int = 24,
    **intrinsics,
) -> RealFrame:
    """Z-buffer render of posed object models into a pcnn-schema frame.

    Each model point splats a ``splat x splat`` pixel block; nearest depth
    wins the z-buffer, and the winner's class writes the label mask.  This
    is the test stand-in for real sensor frames (and a dataset tool: the
    reference's training *images* pipeline never existed — it worked purely
    on clouds).

    Hidden-surface culling: 2048 points splatted sparsely leave pixel gaps
    through which *back-surface* points win the z-buffer, producing a
    physically impossible two-sided depth map (a real sensor sees only the
    front surface; measured bleed-through without culling: ~55% of segment
    pixels).  A post-pass drops any pixel whose depth exceeds the local
    minimum depth within a ``cull_window`` neighborhood by more than
    ``cull_margin`` meters — the discrete analogue of the HPR visibility
    test the training synthesis uses (ops/hpr.py).

    Args:
      obj_models: (num_class, P, >=3) models in object frame.
      class_ids: objects present in the scene.
      rotations: (n_obj, 3, 3); translations: (n_obj, 3).
      cull_window: hidden-surface culling neighborhood in pixels (0 = off).
      cull_margin: depth slack in meters before a pixel is culled.
      densify: extra surface samples per model point (see
        :func:`densify_point_cloud`; 0 renders the raw sparse points).
    """
    K = {**DEFAULT_INTRINSICS, **intrinsics}
    h, w = FRAME_H, FRAME_W
    all_flat, all_z, all_cls = [], [], []
    for cls, R, t in zip(class_ids, rotations, translations):
        surf = (
            _densified(obj_models, cls, densify)
            if densify > 0
            else obj_models[cls][:, :3]
        )
        pts = surf @ R.T + t
        z = pts[:, 2]
        ok = z > 1e-3
        zs = np.where(ok, z, 1.0)
        u = np.round(K["fx"] * pts[:, 0] / zs + K["cx"]).astype(np.int64)
        v = np.round(K["fy"] * pts[:, 1] / zs + K["cy"]).astype(np.int64)
        for du in range(splat):
            for dv in range(splat):
                uu, vv = u + du, v + dv
                m = ok & (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
                all_flat.append(vv[m] * w + uu[m])
                all_z.append(z[m])
                all_cls.append(np.full(m.sum(), cls + 1, np.uint8))

    zbuf = np.full(h * w, np.inf, np.float32)
    label = np.zeros(h * w, np.uint8)
    if all_flat:
        flat = np.concatenate(all_flat)
        z = np.concatenate(all_z)
        cls_v = np.concatenate(all_cls)
        # nearest-depth wins across ALL objects: write in descending depth
        # so the last write per pixel is the closest point
        order = np.argsort(-z, kind="stable")
        zbuf[flat[order]] = z[order]
        label[flat[order]] = cls_v[order]
    zbuf = zbuf.reshape(h, w)
    label = label.reshape(h, w)

    if cull_window > 0:
        from scipy.ndimage import minimum_filter

        local_min = minimum_filter(zbuf, size=cull_window, mode="nearest")
        keep = zbuf <= local_min + cull_margin
        zbuf = np.where(keep, zbuf, np.inf)
        label = np.where(keep, label, 0).astype(np.uint8)

    depth_m = np.where(np.isfinite(zbuf), zbuf, 0.0)
    if depth_noise > 0.0 and rng is not None:
        depth_m = np.where(
            depth_m > 0,
            depth_m + rng.normal(0, depth_noise, depth_m.shape),
            0.0,
        )
    depth = np.clip(depth_m * K["factor_depth"], 0, 65535).astype(np.uint16)

    quats = np.zeros((num_class, 4), np.float32)
    quats[:, 0] = 1.0
    trans = np.zeros((num_class, 3), np.float32)
    onehot = np.zeros((num_class,), np.int64)
    for cls, R, t in zip(class_ids, rotations, translations):
        quats[cls] = _mat_to_quat(R)
        trans[cls] = t
        onehot[cls] = 1

    image = np.zeros((h, w, 3), np.uint8)
    image[..., 0] = (label > 0) * 128  # trivially-colored segmentation view

    return RealFrame(
        image=image, depth=depth, label=label, quaternions=quats,
        translations=trans, class_one_hot=onehot, seq_id=seq_id,
        frame_id=frame_id, fx=K["fx"], fy=K["fy"], cx=K["cx"], cy=K["cy"],
        factor_depth=K["factor_depth"],
    )


def _mat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> wxyz quaternion (numpy, host-side)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s], np.float32)
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
    q = np.zeros(4, np.float32)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def write_sequence(
    path: str, frames: list[RealFrame]
) -> int:
    """Write frames as one {seq:04d}_pcnn.tfrecord file."""
    return tfrecord.write_tfrecord(path, (frame_bytes(f) for f in frames))
