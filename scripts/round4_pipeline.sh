#!/bin/bash
# Round-4 TPU pipeline: runs after the LINEMOD full run finishes.
#   a. build + package-cache the view-extended symmetry tables
#   b. YCB flagship finetune with --sym-view (resume from the committed npz)
#   c. LINEMOD finetune with --sym-view (resume from the 56-epoch ckpt)
# Each train stage auto-resumes from the newest checkpoint on TPU-worker
# crashes (one already happened this round).
set -u
cd /root/repo

probe() {
  for i in $(seq 1 30); do
    timeout 120 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))" >/dev/null 2>&1 && return 0
    echo "[pipeline] probe $i failed; waiting 60s"
    sleep 60
  done
  return 1
}

latest_ckpt() {  # $1 = run-dir prefix, echoes newest run dir containing ckpt/
  ls -td "$1"/*/ 2>/dev/null | while read -r d; do
    if [ -d "$d/ckpt" ]; then echo "${d%/}/ckpt"; break; fi
  done
}

train_with_retry() {  # $1 = run prefix, $2 = initial resume target, rest = args
  local prefix=$1 resume=$2
  shift 2
  local attempt
  for attempt in 1 2 3 4; do
    probe || return 1
    python -m cloudaae_tpu.train "$@" --resume "$resume" && return 0
    echo "[pipeline] train crashed (attempt $attempt)"
    local latest
    latest=$(latest_ckpt "$prefix")
    [ -n "$latest" ] && resume="$latest"
    sleep 30
  done
  return 1
}

# wait for the currently-running LINEMOD training to finish
if [ -f /tmp/train_lm.pid ]; then
  LM_PID=$(cat /tmp/train_lm.pid)
  while kill -0 "$LM_PID" 2>/dev/null; do sleep 30; done
fi
echo "[pipeline] LINEMOD full run exited: $(date)"

# if it crashed short of 56 epochs, resume to completion (a no-op when done:
# the epoch loop is empty at start_epoch >= max_epoch)
LM_CKPT=$(latest_ckpt runs/13/6d)
train_with_retry runs/13/6d "$LM_CKPT" \
  --dataset linemod --generate-poses --rot-rep 6d --sym-loss \
  --max-epoch 56 --checkpoint-every 4 --log-dir runs \
  >> runs/train_lm_finish.out 2>&1 \
  || echo "[pipeline] LINEMOD completion FAILED"

probe
echo "[pipeline] building view-extended symmetry table (21-class)"
python scripts/build_symtable.py --view --commit > runs/symtable_view.out 2>&1 \
  || { echo "[pipeline] symtable build FAILED"; }

echo "[pipeline] YCB flagship --sym-view finetune: $(date)"
train_with_retry runs/21/6d runs/21/6d/20260820-052144/params_latest.npz \
  --generate-poses --rot-rep 6d --sym-loss --sym-view --learning-rate 2e-4 \
  --max-epoch 104 --checkpoint-every 4 --log-dir runs \
  >> runs/train_ycb_ft.out 2>&1 \
  || echo "[pipeline] YCB finetune FAILED"

LM_CKPT=$(latest_ckpt runs/13/6d)
echo "[pipeline] LINEMOD --sym-view finetune from $LM_CKPT: $(date)"
train_with_retry runs/13/6d "$LM_CKPT" \
  --dataset linemod --generate-poses --rot-rep 6d --sym-loss --sym-view \
  --learning-rate 2e-4 --max-epoch 61 --checkpoint-every 4 --log-dir runs \
  >> runs/train_lm_ft.out 2>&1 \
  || echo "[pipeline] LINEMOD finetune FAILED"

echo "[pipeline] DONE: $(date)"
