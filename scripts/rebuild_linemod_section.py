"""Rebuild runs/sections/linemod.md from its committed JSON artifact.

The LINEMOD flagship checkpoint did not change in round 5 (the
multi-hypothesis head is a YCB-flagship capability this round) and its
numbers are already committed in ``runs/sections/linemod.json`` (written
by scripts/eval_linemod.py in round 4, 50 frames/class, paired ICP).
What DID change is the section header contract: the symmetric-stand-in
caveat (VERDICT r4 #7) and the ICP-gate/head provenance note
(ADVICE r4 #2) now live in the generator.  This script re-emits the
markdown in the generator's exact current format from the committed
JSON — same numbers, new header — so RESULTS.md regains a consistent
caption without re-running the 13-class eval (~40 min TPU) against an
unchanged artifact.  A future LINEMOD retrain regenerates the section
through the manifest as usual.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from cloudaae_tpu.config import Config  # noqa: E402
from eval_linemod import LINEMOD_CLASS_NAMES  # noqa: E402


def main():
    src = os.path.join(REPO, "runs/sections/linemod.json")
    with open(src) as f:
        d = json.load(f)
    assert d["icp"] == "both" and d["sym_metric"]
    cfg = Config()
    e = cfg.eval

    # symmetric stand-ins derived from the committed numbers themselves:
    # a class whose single-GT rot error far exceeds its min-over-group
    # rot-sym is one where the symmetry-aware loss forgave real flips
    sym_classes = [
        int(c) for c, v in d["classes"].items()
        if v["icp_off"]["rot_deg"] - v["icp_off"]["rot_sym_deg"] > 10.0
    ]

    rows = [(int(c), v) for c, v in d["classes"].items()]
    rows.sort()
    valid = [v for _, v in rows if v["icp_off"]["frames"]]
    mean = lambda key: float(np.mean([v["icp_off"][key] for v in valid]))
    mean_icp = lambda key: float(np.mean([v["icp_on"][key] for v in valid]))

    out = os.path.join(REPO, "runs/sections/linemod.md")
    with open(out, "w") as f:
        f.write("# LINEMOD — converted-record eval (sim-to-sim)\n\n")
        f.write(
            f"Checkpoint: `{d['ckpt']}` (step {d['step']}).  Protocol: "
            f"{d['frames_per_class']} synthesized single-view FPS512 "
            "records per class (LINEMOD frustum poses, HPR self-occlusion, "
            "sensor noise; real LINEMOD_preprocessed is not mounted — "
            "object models are the 13-class stand-in table from the run "
            "config), evaluated through evaluate.evaluate_converted — the "
            "identical path real converted records take.  ICP: paired "
            "off/on columns (same records)."
            f"  ICP gate: accept_gate={e.icp_accept_gate}, "
            f"centroid_start={e.icp_centroid_start}, "
            f"keep_frac={e.icp_gate_keep_frac} "
            "(gated multi-start; the reference applies ICP "
            "unconditionally).\n\n"
        )
        sym_cls = [f"{c} {LINEMOD_CLASS_NAMES[c]}" for c in sorted(sym_classes)]
        f.write(
            "Caveat: single-GT ADD / ADD<0.1d are metric-blind on "
            "SYMMETRIC stand-in geometries — the flips the "
            "symmetry-aware loss correctly forgives dominate the "
            "column.  Symmetric stand-ins (rot >> rot-sym in this very "
            "table): "
            + ", ".join(sym_cls)
            + ".  rot-sym and the ADD-S family (AUC-S) are the "
            "meaningful columns for those rows; plain ADD is "
            "meaningful only for the asymmetric stand-ins.\n\n"
        )
        f.write("| class | frames | trans (cm) | rot (deg) | rot-sym (deg) |"
                " ADD (cm) | ADD-S (cm) | ADD<0.1d | ADD-S<0.1d |"
                " AUC | AUC-S | trans+ICP | rot-sym+ICP | ADD+ICP "
                "| ADD<0.1d+ICP | AUC-S+ICP |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|---|"
                "---|---|---|---|---|\n")
        for cls, v in rows:
            r, ri = v["icp_off"], v["icp_on"]
            f.write(
                f"| {cls} {LINEMOD_CLASS_NAMES[cls]} | {r['frames']} "
                f"| {r['trans_cm']:.2f} | {r['rot_deg']:.1f} |"
                f" {r['rot_sym_deg']:.1f} |"
                f" {r['add_cm']:.2f} | {r['add_s_cm']:.2f} "
                f"| {r['add_01d']:.2f} | {r['add_s_01d']:.2f} "
                f"| {r['add_auc']:.3f} | {r['add_s_auc']:.3f} |"
                f" {ri['trans_cm']:.2f} | {ri['rot_sym_deg']:.1f} "
                f"| {ri['add_cm']:.2f} | {ri['add_01d']:.2f} "
                f"| {ri['add_s_auc']:.3f} |\n"
            )
        f.write(
            f"| **mean** | | **{mean('trans_cm'):.2f}** "
            f"| **{mean('rot_deg'):.1f}** |"
            f" **{mean('rot_sym_deg'):.1f}** |"
            f" **{mean('add_cm'):.2f}** "
            f"| **{mean('add_s_cm'):.2f}** "
            f"| **{mean('add_01d'):.2f}** "
            f"| **{mean('add_s_01d'):.2f}** "
            f"| **{mean('add_auc'):.3f}** "
            f"| **{mean('add_s_auc'):.3f}** |"
            f" **{mean_icp('trans_cm'):.2f}** "
            f"| **{mean_icp('rot_sym_deg'):.1f}** "
            f"| **{mean_icp('add_cm'):.2f}** "
            f"| **{mean_icp('add_01d'):.2f}** "
            f"| **{mean_icp('add_s_auc'):.3f}** |\n"
        )
    print(f"rebuilt {out} from {src} (numbers unchanged, header current)")


if __name__ == "__main__":
    main()
