#!/bin/bash
# Round-5 RESULTS queue, reprioritized for the round's TPU budget:
# the UNIFORM section (where every VERDICT r4 accuracy target lives)
# regenerates first at the full 50-frame protocol; the records section
# follows at 25 frames (the header states its frame count); assembly
# last.  A killed TPU client leaves a stale lease — probe first.
set -u
cd /root/repo

probe() {
  for i in $(seq 1 20); do
    timeout 150 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))" >/dev/null 2>&1 && return 0
    echo "[results] probe $i failed; waiting 60s"
    sleep 60
  done
  return 1
}

CKPT=runs/21/6d/20260821-190034/params_latest.npz
ALL="0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20"

probe || { echo "[results] TPU never came up"; exit 1; }
echo "[results] uniform 50f: $(date)"
timeout 7200 python scripts/eval_trained.py --ckpt "$CKPT" \
  --out runs/sections/ycb-uniform.md --classes $ALL --frames 50 \
  --sym-metric --sym-view --pose-source uniform --icp both
echo "[results] uniform exit=$?: $(date)"

echo "[results] records 25f: $(date)"
timeout 5400 python scripts/eval_trained.py --ckpt "$CKPT" \
  --out runs/sections/ycb-records.md --classes $ALL --frames 25 \
  --sym-metric --sym-view --pose-source records --icp both
echo "[results] records exit=$?: $(date)"

python scripts/repro_results.py --assemble-only
echo "[results] DONE: $(date)"
