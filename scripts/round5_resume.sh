#!/bin/bash
# Round-5 train, resume leg.  The original pipeline's orbax ckpt/ dirs are
# gitignored and did not survive a workspace restore; the committed
# params_latest.npz (step 23840, end of epoch 7) is the survival artifact
# restore_any loads (fresh Adam moments, logged as such).  Crash-retry then
# follows the newest ckpt created AFTER this script started.
set -u
cd /root/repo

probe() {
  for i in $(seq 1 30); do
    timeout 150 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))" >/dev/null 2>&1 && return 0
    echo "[pipeline] probe $i failed; waiting 60s"
    sleep 60
  done
  return 1
}

latest_ckpt() {
  ls -td "$1"/*/ 2>/dev/null | while read -r d; do
    if [ -d "$d/ckpt" ]; then echo "${d%/}/ckpt"; break; fi
  done
}

MARK=$(date +%s)
ARGS=(--generate-poses --rot-rep 6d --rot-hyp 4 --sym-loss --sym-view
      --learning-rate 2e-4 --max-epoch 45 --checkpoint-every 4
      --steps-per-call 4 --log-dir runs)

probe || { echo "[pipeline] TPU never came up"; exit 1; }
echo "[pipeline] round-5 resume leg: $(date)"
python -m cloudaae_tpu.train "${ARGS[@]}" \
  --resume runs/21/6d/20260821-155207 \
  && { echo "[pipeline] DONE: $(date)"; exit 0; }

for attempt in 1 2 3 4 5; do
  echo "[pipeline] train crashed (attempt $attempt): $(date)"
  sleep 30
  probe || { echo "[pipeline] TPU never came back"; exit 1; }
  resume=$(latest_ckpt runs/21/6d)
  rdir=$(dirname "$resume")
  if [ -z "$resume" ] || [ "$(stat -c %Y "$rdir")" -lt "$MARK" ]; then
    echo "[pipeline] no ckpt from this leg yet; resuming the committed npz"
    python -m cloudaae_tpu.train "${ARGS[@]}" \
      --resume runs/21/6d/20260821-155207 \
      && { echo "[pipeline] DONE: $(date)"; exit 0; }
  else
    echo "[pipeline] resuming $resume"
    python -m cloudaae_tpu.train "${ARGS[@]}" --resume "$resume" \
      && { echo "[pipeline] DONE: $(date)"; exit 0; }
  fi
done
echo "[pipeline] FAILED after retries: $(date)"
exit 1
