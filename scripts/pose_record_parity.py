"""Fingerprint the SHIPPED pose records vs our on-device pose sampler.

The reference trains from per-class pose tfrecords
(``ycb_video_data_tfRecords/train_syn/{cls}_syn.tfrecords``,
train_cloudAAE_ycbv.py:38,58-64).  Measuring both distributions here
established that the shipped records are NOT draws from
``utils/sample_pose_in_frustum.py`` (the reference uses that sampler only
for occluder poses, utils/generate_occluder.py:3): the records carry
Haar-like rotation-angle quantiles (median |angle| 2.41 rad, vs 1.57 for
the frustum sampler's uniform angle), a biased rotation-axis direction
(mean resultant length 0.24 — table-top scene statistics — vs isotropic
0.00), and a z range of ~[0.46, 1.45] m vs the YCBV frustum's [0.5, 1.0].

So the two pose regimes this framework ships are *different by design*:

  * default (reference-parity) training streams the shipped records
    (data.ycb.load_pose_records — this is what the "YCB records" eval
    section draws from);
  * ``--generate-poses`` is the beyond-parity full-SO(3) regime
    (synth.frustum.sample_pose on device; docs/VIEW_SYMMETRY.md explains
    why the flagship trains there).

    python scripts/pose_record_parity.py [--out runs/pose_parity.json]

This script fingerprints both; tests/test_pose_parity.py pins the shipped
records' pooled stats (the data supply chain: a reader bug or a swapped
mount fails CI) and the sampler's design contract (isotropy, uniform
angle, frustum z-band).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_SYN = "/root/reference/ycb_video_data_tfRecords/train_syn"


def stats(trans: np.ndarray, axag: np.ndarray) -> dict:
    ang = np.linalg.norm(axag, axis=1)
    axis = axag / np.maximum(ang[:, None], 1e-9)
    return {
        "n": int(len(trans)),
        "t_mean": [round(float(x), 5) for x in trans.mean(0)],
        "t_std": [round(float(x), 5) for x in trans.std(0)],
        "z_q": [round(float(np.quantile(trans[:, 2], q)), 5)
                for q in (0.01, 0.25, 0.5, 0.75, 0.99)],
        "ang_q": [round(float(np.quantile(ang, q)), 5)
                  for q in (0.01, 0.25, 0.5, 0.75, 0.99)],
        # mean resultant length of axis directions: ~0 iff isotropic
        "axis_mrl": round(float(np.linalg.norm(axis.mean(0))), 5),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/pose_parity.json")
    p.add_argument("--per-class", action="store_true",
                   help="also emit per-class record stats (records only; "
                        "our sampler is class-independent)")
    args = p.parse_args()

    import jax

    from cloudaae_tpu.config import Config
    from cloudaae_tpu.data import load_pose_records
    from cloudaae_tpu.train import generate_pose_table

    classes = sorted(
        int(f.split("_")[0]) for f in os.listdir(TRAIN_SYN)
        if f.endswith("_syn.tfrecords")
    )
    recs = load_pose_records(TRAIN_SYN, classes)
    n = len(recs["class_id"])
    ours = generate_pose_table(Config(), n, seed=7)

    report = {
        "shipped_records": stats(recs["translation"], recs["axisangle"]),
        "our_sampler": stats(ours["translation"], ours["axisangle"]),
        "classes": len(classes),
    }
    if args.per_class:
        per = {}
        for c in classes:
            m = recs["class_id"] == c
            per[c] = stats(recs["translation"][m], recs["axisangle"][m])
        report["per_class_records"] = per

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    a, b = report["shipped_records"], report["our_sampler"]
    print(json.dumps(report["shipped_records"]))
    print(json.dumps(report["our_sampler"]))
    for k in ("t_mean", "t_std", "z_q", "ang_q"):
        d = np.max(np.abs(np.asarray(a[k]) - np.asarray(b[k])))
        print(f"max |delta {k}|: {d:.5f}")
    print(f"axis_mrl: records {a['axis_mrl']} ours {b['axis_mrl']}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
