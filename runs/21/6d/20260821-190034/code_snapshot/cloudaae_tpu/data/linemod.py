"""LINEMOD dataset: directory readers, converter, converted-record loader.

Offline equivalent of ``linemod_data/linemod_to_tfrecord_small.py`` and its
helpers (``data_gen_tools_linemod.py``, ``read_yml.py``) with the same
contracts:

  * directory layout ``data/{cls:02d}/{rgb,depth,mask}/{frame:04d}.png`` +
    ``gt.yml``/``info.yml`` + ``train.txt``/``test.txt``; test-split masks
    come from ``segnet_results/{cls:02d}_label/{frame}_label.png``
    (linemod_to_tfrecord_small.py:31-48)
  * per-class mean-distance thresholds (:20)
  * class remapping skipping LINEMOD ids 3 and 7 -> 13 contiguous ids
    (:255-266, data_gen_tools_linemod.py:27-33)
  * >=512 valid points filter, FPS to 512, rotation-matrix -> axis-angle
    via the SO(3) log (mat_2_quat :118-123)
  * output schema {class_id, frame_id, rotation_mat[9], axisangle[3],
    translation[3], num_valid_points_in_segment, xyz[512,3], rgb[512,3],
    data_source} in files named
    ``{prefix}_files_FPS512_{cls}_adapt_threshold.tfrecords`` (:189-249)

Host-side (offline) by design — this is a one-time conversion; the hot
paths stay on device.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from cloudaae_tpu.data import tfrecord

# Per-class mean-distance thresholds for the 13 remapped classes
# (linemod_to_tfrecord_small.py:20).
THRESHOLD_DISTANCE_PER_CLASS = np.array(
    [0.05, 0.15, 0.1, 0.1, 0.1, 0.15, 0.1, 0.1, 0.1, 0.1, 0.1, 0.2, 0.1],
    np.float64,
)
NUM_POINT = 512
LINEMOD_CLASS_IDS = [c for c in range(1, 16) if c not in (3, 7)]


def remap_class(linemod_cls: int) -> int:
    """LINEMOD 1..15 (minus 3, 7) -> contiguous 0..12
    (data_gen_tools_linemod.py:27-33)."""
    if linemod_cls in (3, 7):
        raise ValueError(f"class {linemod_cls} is excluded from LINEMOD-13")
    if linemod_cls in (1, 2):
        return linemod_cls - 1
    if linemod_cls in (4, 5, 6):
        return linemod_cls - 2
    return linemod_cls - 3


def _read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def read_camera(info_yml: dict, frame_id: int):
    """Intrinsics + depth scale (read_yml.py:6-16): ``depth_scale * 1000``
    converts the mm-unit depth to meters on division."""
    info = info_yml[frame_id]
    k = info["cam_K"]
    return float(k[0]), float(k[4]), float(k[2]), float(k[5]), float(
        info["depth_scale"]
    ) * 1000.0


def read_pose(gt_yml: dict, frame_id: int, linemod_cls: int):
    """Ground-truth pose in meters (read_yml.py:19-45; mm -> m at :38).

    Class 2's sequence lists a second object first (reading_idx=1); frames
    993/994 of that sequence are mislabeled, handled as in the reference
    (:40-42).
    """
    entries = gt_yml[frame_id]
    idx = 1 if linemod_cls == 2 else 0
    entry = entries[idx] if idx < len(entries) else entries[0]
    if entry["obj_id"] != linemod_cls:
        alt = entries[idx - 1]
        if alt["obj_id"] != linemod_cls:
            raise ValueError(
                f"class {linemod_cls} not found in frame {frame_id}"
            )
        # reference keeps reading entry idx even here (:40-42)
    t = np.asarray(entry["cam_t_m2c"], np.float64) * 0.001
    R = np.asarray(entry["cam_R_m2c"], np.float64).reshape(3, 3)
    return t, R


@dataclass
class LinemodSample:
    class_id: int           # remapped 0..12
    frame_id: int
    rotation_mat: np.ndarray
    axisangle: np.ndarray
    translation: np.ndarray
    num_valid_points_in_segment: int
    xyz: np.ndarray         # (512, 3)
    rgb: np.ndarray         # (512, 3) in [0, 1]
    data_source: int


def segment_cloud(
    depth: np.ndarray, mask: np.ndarray, rgb: np.ndarray,
    fx, fy, cx, cy, depth_scale,
):
    """Masked backprojection (get_segment_cloud :52-74)."""
    valid = (mask.reshape(mask.shape[0], mask.shape[1], -1)[..., 0] != 0) & (
        depth != 0
    )
    vs, us = np.nonzero(valid)
    z = depth[vs, us].astype(np.float64) / depth_scale
    x = (us - cx) * z / fx
    y = (vs - cy) * z / fy
    xyz = np.stack([x, y, z], axis=1)
    colors = rgb[vs, us].astype(np.float64) / 255.0
    return xyz, colors


def np_fps(pts: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """Random-start numpy FPS (linemod_to_tfrecord_small.py:103-115)."""
    idx = np.zeros(k, np.int64)
    idx[0] = rng.integers(0, len(pts))
    d = ((pts - pts[idx[0]]) ** 2).sum(-1)
    for i in range(1, k):
        idx[i] = d.argmax()
        d = np.minimum(d, ((pts - pts[idx[i]]) ** 2).sum(-1))
    return idx


def mat_to_axag(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> axis-angle via the SO(3) log (mat_2_quat :118-123)."""
    import jax.numpy as jnp

    from cloudaae_tpu import so3

    axag, _ = so3.log_map(jnp.asarray(R, jnp.float32))
    return np.asarray(axag, np.float64)


def convert_class(
    root: str,
    linemod_cls: int,
    split: str = "test",
    data_source: int = 1,
    seg_results_dir: str | None = None,
    seed: int = 0,
) -> Iterator[LinemodSample]:
    """Yield converted samples for one LINEMOD class directory."""
    import yaml

    cls_dir = os.path.join(root, "data", f"{linemod_cls:02d}")
    with open(os.path.join(cls_dir, f"{split}.txt")) as f:
        frames = f.read().splitlines()
    with open(os.path.join(cls_dir, "gt.yml")) as f:
        gt_yml = yaml.safe_load(f)
    with open(os.path.join(cls_dir, "info.yml")) as f:
        info_yml = yaml.safe_load(f)

    rng = np.random.default_rng(seed)
    cls0 = remap_class(linemod_cls)
    thr = THRESHOLD_DISTANCE_PER_CLASS[cls0]

    for frame in frames:
        frame_id = int(frame)
        rgb = _read_png(os.path.join(cls_dir, "rgb", f"{frame}.png"))[..., :3]
        depth = _read_png(os.path.join(cls_dir, "depth", f"{frame}.png"))
        if split == "test" and seg_results_dir:
            mask_path = os.path.join(
                seg_results_dir, f"{linemod_cls:02d}_label", f"{frame}_label.png"
            )
        else:
            mask_path = os.path.join(cls_dir, "mask", f"{frame}.png")
        mask = _read_png(mask_path)

        fx, fy, cx, cy, depth_scale = read_camera(info_yml, frame_id)
        t, R = read_pose(gt_yml, frame_id, linemod_cls)

        xyz, colors = segment_cloud(depth, mask, rgb, fx, fy, cx, cy, depth_scale)
        if len(xyz) == 0:
            continue
        # mean-distance filter with the per-class threshold (:84-96)
        d = np.linalg.norm(xyz - xyz.mean(0), axis=1)
        keep = d <= thr
        if keep.sum() < NUM_POINT:
            continue
        xyz_f, rgb_f = xyz[keep], colors[keep]
        idx = np_fps(xyz_f, NUM_POINT, rng)
        yield LinemodSample(
            class_id=cls0,
            frame_id=frame_id,
            rotation_mat=R,
            axisangle=mat_to_axag(R),
            translation=t,
            num_valid_points_in_segment=int(keep.sum()),
            xyz=xyz_f[idx],
            rgb=rgb_f[idx],
            data_source=data_source,
        )


def sample_bytes(s: LinemodSample) -> bytes:
    return tfrecord.example_bytes(
        {
            "class_id": np.asarray([s.class_id], np.int64),
            "frame_id": np.asarray([s.frame_id], np.int64),
            "rotation_mat": s.rotation_mat.reshape(-1).astype(np.float32),
            "axisangle": s.axisangle.reshape(-1).astype(np.float32),
            "translation": s.translation.reshape(-1).astype(np.float32),
            "num_valid_points_in_segment": np.asarray(
                [s.num_valid_points_in_segment], np.int64
            ),
            "xyz": s.xyz.reshape(-1).astype(np.float32),
            "rgb": s.rgb.reshape(-1).astype(np.float32),
            "data_source": np.asarray([s.data_source], np.int64),
        }
    )


def parse_sample(payload: bytes) -> LinemodSample:
    ex = tfrecord.parse_example(payload)
    return LinemodSample(
        class_id=int(ex["class_id"].int64_list[0]),
        frame_id=int(ex["frame_id"].int64_list[0]),
        rotation_mat=ex["rotation_mat"].float_list.reshape(3, 3),
        axisangle=ex["axisangle"].float_list,
        translation=ex["translation"].float_list,
        num_valid_points_in_segment=int(
            ex["num_valid_points_in_segment"].int64_list[0]
        ),
        xyz=ex["xyz"].float_list.reshape(NUM_POINT, 3),
        rgb=ex["rgb"].float_list.reshape(NUM_POINT, 3),
        data_source=int(ex["data_source"].int64_list[0]),
    )


def record_path(out_dir: str, split: str, remapped_cls: int) -> str:
    """Reference naming: {prefix}_files_FPS512_{cls}_adapt_threshold.tfrecords
    (linemod_to_tfrecord_small.py:260-266)."""
    return os.path.join(
        out_dir, f"{split}_files_FPS512_{remapped_cls}_adapt_threshold.tfrecords"
    )


def convert_dataset(
    root: str,
    out_dir: str,
    split: str = "test",
    data_source: int = 1,
    classes: list[int] | None = None,
    seg_results_dir: str | None = None,
) -> dict[int, int]:
    """Convert all (or selected) LINEMOD classes; returns {cls0: count}."""
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[int, int] = {}
    for linemod_cls in classes or LINEMOD_CLASS_IDS:
        cls0 = remap_class(linemod_cls)
        path = record_path(out_dir, split, cls0)
        n = tfrecord.write_tfrecord(
            path,
            (
                sample_bytes(s)
                for s in convert_class(
                    root, linemod_cls, split, data_source, seg_results_dir
                )
            ),
        )
        counts[cls0] = n
    return counts


def load_converted(path: str) -> Iterator[LinemodSample]:
    for payload in tfrecord.iter_tfrecord(path):
        yield parse_sample(payload)


def read_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read vertices (+ per-vertex colors when present) from a PLY mesh.

    Supports ascii and binary_little_endian — the two formats
    LINEMOD_preprocessed ships its ``models/obj_{cls:02d}.ply`` meshes in.
    Returns (xyz float64 (V, 3), rgb float64 (V, 3) in [0, 1]; rgb is ones
    when the file carries no color).  Faces are ignored: the pose pipeline
    consumes point clouds (object model schema, SURVEY.md §2.9).
    """
    _SIZES = {"char": "i1", "uchar": "u1", "short": "i2", "ushort": "u2",
              "int": "i4", "uint": "u4", "float": "f4", "double": "f8",
              "int8": "i1", "uint8": "u1", "int16": "i2", "uint16": "u2",
              "int32": "i4", "uint32": "u4", "float32": "f4", "float64": "f8"}
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n_vertex = 0
        props: list[tuple[str, str]] = []
        in_vertex = False
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unterminated PLY header")
            parts = line.decode("ascii", "replace").strip().split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                in_vertex = parts[1] == "vertex"
                if in_vertex:
                    n_vertex = int(parts[2])
            elif parts[0] == "property" and in_vertex:
                if parts[1] == "list":
                    raise ValueError(f"{path}: list property on vertices")
                props.append((parts[2], _SIZES[parts[1]]))
            elif parts[0] == "end_header":
                break
        names = [n for n, _ in props]
        if fmt == "ascii":
            rows = np.loadtxt(
                (f.readline() for _ in range(n_vertex)),
                dtype=np.float64, ndmin=2,
            )
            cols = {n: rows[:, i] for i, (n, _) in enumerate(props)}
        elif fmt == "binary_little_endian":
            dt = np.dtype([(n, "<" + s) for n, s in props])
            raw = np.frombuffer(f.read(n_vertex * dt.itemsize), dtype=dt)
            cols = {n: raw[n].astype(np.float64) for n in names}
        else:
            raise ValueError(f"{path}: unsupported PLY format {fmt}")
    xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    if {"red", "green", "blue"} <= set(names):
        rgb = np.stack([cols["red"], cols["green"], cols["blue"]], axis=1)
        if rgb.max() > 1.0:
            rgb = rgb / 255.0
    else:
        rgb = np.ones_like(xyz)
    return xyz, rgb


def convert_object_models(
    root: str,
    out_path: str,
    num_points: int = 2048,
    classes: list[int] | None = None,
    seed: int = 0,
) -> np.ndarray:
    """LINEMOD ``models/obj_{cls:02d}.ply`` meshes -> the YCB object-model
    tfrecord schema ({label, model[num_points, 6]}, SURVEY.md §2.9) so the
    whole eval/synthesis stack consumes LINEMOD models unchanged.

    Vertices are FPS-downsampled (np_fps, the converter's own sampler) to
    ``num_points`` and converted mm -> m (LINEMOD plys are millimeter-unit,
    same convention as read_pose's cam_t_m2c :38).  Returns the stacked
    (13, num_points, 6) array and writes the tfrecord.
    """
    from cloudaae_tpu.data.ycb import write_object_models

    rng = np.random.default_rng(seed)
    models = []
    for linemod_cls in classes or LINEMOD_CLASS_IDS:
        xyz, rgb = read_ply(
            os.path.join(root, "models", f"obj_{linemod_cls:02d}.ply")
        )
        xyz = xyz * 0.001
        if len(xyz) >= num_points:
            idx = np_fps(xyz, num_points, rng)
        else:  # sparse mesh: resample with replacement to the fixed size
            idx = np.concatenate(
                [np.arange(len(xyz)),
                 rng.integers(0, len(xyz), num_points - len(xyz))]
            )
        models.append(np.concatenate([xyz[idx], rgb[idx]], axis=1))
    stacked = np.stack(models).astype(np.float32)
    write_object_models(out_path, stacked)
    return stacked


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Convert LINEMOD_preprocessed to FPS512 tfrecords "
        "(reference: linemod_data/linemod_to_tfrecord_small.py)"
    )
    p.add_argument("--root", required=True,
                   help="Linemod_preprocessed directory")
    p.add_argument("--out-dir", default=None,
                   help="frame-record output dir (required unless "
                        "--skip-frames)")
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--data-source", type=int, default=1)
    p.add_argument("--classes", type=int, nargs="*", default=None,
                   help="LINEMOD class ids (1..15, minus 3 and 7)")
    p.add_argument("--seg-results-dir", default=None,
                   help="segnet_results dir for test-split masks")
    p.add_argument("--object-models", default=None,
                   help="also convert models/obj_XX.ply meshes to a "
                        "YCB-schema object-model tfrecord at this path")
    p.add_argument("--skip-frames", action="store_true",
                   help="only convert object models, not frame records")
    args = p.parse_args(argv)
    if args.object_models:
        models = convert_object_models(
            args.root, args.object_models, classes=args.classes
        )
        print(f"object models: {models.shape} -> {args.object_models}")
    if not args.skip_frames:
        if not args.out_dir:
            p.error("--out-dir is required unless --skip-frames")
        counts = convert_dataset(
            args.root, args.out_dir, args.split, args.data_source,
            args.classes, args.seg_results_dir,
        )
        for cls0, n in sorted(counts.items()):
            print(f"class {cls0}: {n} records")


if __name__ == "__main__":
    main()
