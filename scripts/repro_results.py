"""Regenerate RESULTS.md from COMMITTED artifacts only (VERDICT r2 #6).

Every number in RESULTS.md must be reproducible from a fresh checkout:
this script re-runs the exact eval commands against the committed
``params_latest.npz`` deploy artifacts and rebuilds RESULTS.md from their
section outputs.  It fails loudly if any referenced artifact is missing —
that is the point: accuracy claims whose checkpoint is gone must not
survive a round boundary (STATUS.md round-2 "Checkpoint survival").

    python scripts/repro_results.py [--quick] [--only SECTION ...]

``--quick`` shrinks frames/classes for a smoke pass (CI); the committed
RESULTS.md is always generated with the full manifest.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The flagship full-SO(3) checkpoint.  Round 5: the 4-hypothesis rotation
# head (docs/MULTIHYP.md) trained 45 epochs (134.1k steps) under the
# product-verified view-extended symmetry table — encoder/decoder/
# translation head/rot trunk warm-started from the round-4 flagship
# (runs/21/6d/20260821-120837, step 357.6k), k-output layer fresh
# (--rot-hyp 4 --sym-loss --sym-view, lr 2e-4; legs
# runs/21/6d/20260821-155207 then -190034, runs/round5_pipeline.out).
# Round-4 lineage: 90-epoch --generate-poses --rot-rep 6d --sym-loss run
# (20260820-013359 -> 20260820-052144, step 268200) + --sym-view
# finetunes (20260821-060344, -120837).
FLAGSHIP = "runs/21/6d/20260821-190034/params_latest.npz"

ALL_CLASSES = [str(c) for c in range(21)]

# The LINEMOD flagship: 13-class --dataset linemod --generate-poses
# --rot-rep 6d --sym-loss run trained to the full per-class budget
# (~168k steps == 1.65M samples/class, the YCB flagship's budget;
# runs/train_lm_full*.out), + a 5-epoch --sym-view finetune
# (runs/train_lm_ft.out).
LINEMOD_FLAGSHIP = "runs/13/6d/20260821-072004/params_latest.npz"

# name -> (script, artifact, extra args).  Each entry is one committed
# command; sections concatenate into RESULTS.md in this order.
MANIFEST = [
    # Each section renders its frames ONCE and evaluates them through the
    # ICP-off and ICP-on forwards (paired columns, --icp both).  The
    # rotation metric is the min-over-group geodesic with the
    # depth-view-extended symmetry groups (--sym-view,
    # docs/VIEW_SYMMETRY.md); ICP is the gated multi-start refinement
    # (EvalConfig.icp_accept_gate / icp_centroid_start).
    (
        "ycb-records",
        "scripts/eval_trained.py",
        FLAGSHIP,
        ["--classes", *ALL_CLASSES, "--frames", "50", "--sym-metric",
         "--sym-view", "--pose-source", "records", "--icp", "both"],
    ),
    (
        "ycb-uniform",
        "scripts/eval_trained.py",
        FLAGSHIP,
        ["--classes", *ALL_CLASSES, "--frames", "50", "--sym-metric",
         "--sym-view", "--pose-source", "uniform", "--icp", "both"],
    ),
    (
        "linemod",
        "scripts/eval_linemod.py",
        LINEMOD_FLAGSHIP,
        ["--frames", "50", "--icp", "both", "--sym-metric", "--sym-view"],
    ),
]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="2 classes x 4 frames smoke pass (writes nothing)")
    p.add_argument("--only", nargs="*", default=None,
                   help="section names to regenerate (default: all)")
    p.add_argument("--assemble-only", action="store_true",
                   help="skip re-running the eval commands; concatenate the "
                        "existing section files (still verifies the "
                        "committed artifacts exist)")
    p.add_argument("--out", default="RESULTS.md")
    p.add_argument("--sections-dir", default="runs/sections")
    args = p.parse_args()

    manifest = [m for m in MANIFEST if not args.only or m[0] in args.only]
    missing = [a for _, _, a, _ in manifest
               if not os.path.exists(os.path.join(REPO, a))]
    if missing:
        sys.exit(
            "MISSING COMMITTED ARTIFACTS — RESULTS.md is unreproducible:\n  "
            + "\n  ".join(missing)
            + "\ncommit the params_latest.npz (checkpoint.export_params) "
            "for every evaluated run."
        )

    os.makedirs(os.path.join(REPO, args.sections_dir), exist_ok=True)
    if args.assemble_only:
        sections = []
        for name, _, _, _ in manifest:
            section = os.path.join(args.sections_dir, f"{name}.md")
            if not os.path.exists(os.path.join(REPO, section)):
                sys.exit(f"missing section file {section}; run without "
                         "--assemble-only to regenerate it")
            sections.append((name, section))
        _assemble(args, sections)
        return

    # --quick must not clobber the committed section files (a later
    # --assemble-only would then build RESULTS.md from 4-frame smoke
    # numbers): smoke sections go to a throwaway dir
    sections_dir = args.sections_dir
    if args.quick:
        import tempfile

        sections_dir = tempfile.mkdtemp(prefix="repro_quick_")
    sections = []
    for name, script, artifact, extra in manifest:
        section = os.path.join(sections_dir, f"{name}.md")
        if args.quick:  # shrink the workload, keep the artifact checks
            groups: list[list[str]] = []
            for tok in extra:
                if tok.startswith("--"):
                    groups.append([tok])
                else:
                    groups[-1].append(tok)
            extra = [
                tok for g in groups if g[0] not in ("--classes", "--frames")
                for tok in g
            ] + ["--frames", "4"]
            if name.startswith("ycb"):
                extra += ["--classes", "2", "9"]
        cmd = [
            sys.executable, script,
            "--ckpt", artifact, "--out", section, *extra,
        ]
        print("::", " ".join(cmd), flush=True)
        subprocess.run(cmd, cwd=REPO, check=True)
        sections.append((name, section))

    if args.quick:
        print("quick pass OK (RESULTS.md untouched)")
        return

    _assemble(args, sections)


def _assemble(args, sections):
    with open(os.path.join(REPO, args.out), "w") as f:
        f.write("# Results — regenerated by scripts/repro_results.py from "
                "committed artifacts\n")
        # optional hand-written preamble (run provenance, headline claims)
        preamble = os.path.join(REPO, args.sections_dir, "_preamble.md")
        if os.path.exists(preamble):
            with open(preamble) as s:
                f.write("\n" + s.read())
        for name, section in sections:
            with open(os.path.join(REPO, section)) as s:
                body = s.read()
            # demote the section's own H1 under the top header
            if body.startswith("# "):
                body = "#" + body
            f.write(f"\n\n<!-- section: {name} -->\n\n{body}")
    print(f"wrote {args.out} from {len(sections)} sections")


if __name__ == "__main__":
    main()
