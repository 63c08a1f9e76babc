"""Calibrate the view-symmetry detector on the YCB models (CPU).

Prints, per class: the geometric group size, every ICP-refined grid
candidate outside the group with its rotation angle / axis / geometric
score / view-ambiguity fraction, and the final extended table size —
the evidence for choosing ``view_tol`` / ``view_frac`` defaults.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/calibrate_viewsym.py [--classes 0 5 ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--classes", type=int, nargs="*", default=None)
    p.add_argument("--view-tol", type=float, default=1.6)
    p.add_argument("--num-views", type=int, default=20)
    args = p.parse_args()

    import jax

    assert jax.default_backend() == "cpu", "run me on CPU (TPU is busy)"
    import jax.numpy as jnp

    from cloudaae_tpu import symmetry
    from cloudaae_tpu.config import YCB_CLASS_NAMES
    from cloudaae_tpu.data import load_object_models

    obj = load_object_models(
        "/root/reference/object_model_tfrecord/obj_models.tfrecords"
    )
    classes = args.classes if args.classes is not None else range(obj.shape[0])

    for c in classes:
        pts_np = np.asarray(obj[c][..., :3], np.float32)
        pts = jnp.asarray(pts_np)
        base = symmetry.detect_symmetries(pts_np)
        nbase = int(symmetry.num_symmetries(base[None])[0])

        cands = symmetry.candidate_rotations(pts)
        scores = np.asarray(symmetry.symmetry_score(pts, cands))
        gated = np.flatnonzero(scores < 8.0)
        refined = np.asarray(
            symmetry.refine_rotations(pts, cands[gated]), np.float32
        )
        rescored = np.asarray(symmetry.symmetry_score(pts, refined))
        eye = np.eye(3, dtype=np.float32)
        group = [eye] + [
            R for R in base if symmetry._geodesic_deg(R, eye) > 1e-3
        ]
        min_sep = 180.0 / 16
        uniq, uscores = [], []
        for R, s in zip(refined, rescored):
            if any(symmetry._geodesic_deg(R, g) <= min_sep for g in group):
                continue
            if any(symmetry._geodesic_deg(R, u) <= min_sep for u in uniq):
                continue
            uniq.append(R)
            uscores.append(s)
        print(f"== class {c} {YCB_CLASS_NAMES[c]}: geometric group {nbase}, "
              f"{len(uniq)} fresh candidates", flush=True)
        if not uniq:
            continue
        vis = symmetry.view_visibility_masks(pts, num_views=args.num_views)
        fracs = symmetry.view_ambiguity_fraction(
            pts, np.stack(uniq), vis, view_tol=args.view_tol
        )
        for R, s, f in zip(uniq, uscores, fracs):
            ang = symmetry._geodesic_deg(R, eye)
            w, v = np.linalg.eigh((R + R.T) / 2)
            axis = v[:, np.argmax(w)]
            print(
                f"   angle {ang:6.1f}  axis [{axis[0]:+.2f} {axis[1]:+.2f} "
                f"{axis[2]:+.2f}]  geo-score {s:5.2f}  view-frac {f:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
