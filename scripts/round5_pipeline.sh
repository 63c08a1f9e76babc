#!/bin/bash
# Round-5 TPU pipeline: the VERDICT r4 #1+#2 train — fresh 4-hypothesis
# rotation head under the product-verified view-extended symmetry table,
# everything else warm-started from the round-4 flagship (step 357.6k).
# The fresh rot head escapes foam_brick's wrong-flip basin (finetuning the
# old head provably could not, STATUS r4) and the WTA hypotheses address
# the view-partial ambiguity classes (pitcher/mug/scissors/marker).
# Auto-resumes from the newest checkpoint on TPU-worker crashes.
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

latest_ckpt() {  # newest run dir under $1 containing ckpt/
  ls -td "$1"/*/ 2>/dev/null | while read -r d; do
    if [ -d "$d/ckpt" ]; then echo "${d%/}/ckpt"; break; fi
  done
}

MARK=$(date +%s)
ARGS=(--generate-poses --rot-rep 6d --rot-hyp 4 --sym-loss --sym-view
      --learning-rate 2e-4 --max-epoch 45 --checkpoint-every 4
      --steps-per-call 4 --log-dir runs)

probe || { echo "[pipeline] TPU never came up"; exit 1; }
echo "[pipeline] round-5 multi-hyp train: $(date)"
python -m cloudaae_tpu.train "${ARGS[@]}" \
  --transfer-compatible runs/21/6d/20260821-120837 \
  && { echo "[pipeline] DONE: $(date)"; exit 0; }

# crash path: resume the newest checkpoint CREATED BY THIS PIPELINE
for attempt in 1 2 3 4 5; do
  echo "[pipeline] train crashed (attempt $attempt): $(date)"
  sleep 30
  probe || { echo "[pipeline] TPU never came back"; exit 1; }
  resume=$(latest_ckpt runs/21/6d)
  # only resume run dirs newer than this pipeline's start (the warm-start
  # source dir also has a ckpt/ and must not be resumed as if it were ours)
  rdir=$(dirname "$resume")
  if [ -z "$resume" ] || [ "$(stat -c %Y "$rdir")" -lt "$MARK" ]; then
    echo "[pipeline] no checkpoint from this run yet; restarting fresh"
    python -m cloudaae_tpu.train "${ARGS[@]}" \
      --transfer-compatible runs/21/6d/20260821-120837 \
      && { echo "[pipeline] DONE: $(date)"; exit 0; }
  else
    echo "[pipeline] resuming $resume"
    python -m cloudaae_tpu.train "${ARGS[@]}" --resume "$resume" \
      && { echo "[pipeline] DONE: $(date)"; exit 0; }
  fi
done
echo "[pipeline] FAILED after retries: $(date)"
exit 1
