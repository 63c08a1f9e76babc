#!/bin/bash
# Round-5 post-train TPU queue.  Waits for the resume-leg train pipeline to
# finish, then runs (strictly sequentially -- one TPU client at a time):
#   1. probe eval of the new multi-hyp flagship on the 5 classes VERDICT r4
#      names (pitcher 10, mug 13, marker 14, scissors 16, foam_brick 20);
#   2. pitcher_base per-frame translation diagnosis (VERDICT r4 #3), on the
#      round-4 flagship (the observation under diagnosis) AND the new one;
#   3. the hardened hpr6 trajectory gate at 2k steps + noise arm
#      (VERDICT r4 #5);
#   4. the full bench suite incl. batch-size scaling (VERDICT r4 #6).
# The full RESULTS regeneration is driven interactively afterwards (the
# manifest's FLAGSHIP pointer moves only once the probe confirms the run).
set -u
cd /root/repo

echo "[posttrain] waiting for train pipeline: $(date)"
while :; do
  if tail -5 runs/round5_pipeline.out | grep -q "\[pipeline\] DONE"; then
    break
  fi
  if tail -5 runs/round5_pipeline.out | grep -q "\[pipeline\] FAILED"; then
    echo "[posttrain] train pipeline FAILED; aborting queue"
    exit 1
  fi
  sleep 60
done
echo "[posttrain] train done: $(date)"
sleep 10

# newest run dir with an exported params npz = the finished leg
NEW=$(ls -td runs/21/6d/*/ | while read -r d; do
  [ -f "$d/params_latest.npz" ] && [ -f "$d/config.json" ] && echo "${d%/}" && break
done)
echo "[posttrain] new flagship run dir: $NEW"

echo "[posttrain] 1/4 probe eval: $(date)"
timeout 3600 python scripts/eval_trained.py \
  --ckpt "$NEW/params_latest.npz" \
  --classes 10 13 14 16 20 --frames 50 \
  --pose-source uniform --sym-metric --sym-view --icp both \
  --out runs/r5_probe_uniform.md > runs/r5_probe.out 2>&1
echo "[posttrain] probe exit=$?: $(date)"

echo "[posttrain] 2/4 pitcher diagnosis: $(date)"
timeout 2400 python scripts/diagnose_trans.py \
  --ckpt runs/21/6d/20260821-060344/params_latest.npz --cls 10 --frames 50 \
  --out runs/diagnose_pitcher_r4.json > runs/diagnose_pitcher_r4.out 2>&1
echo "[posttrain] r4 diagnosis exit=$?"
timeout 2400 python scripts/diagnose_trans.py \
  --ckpt "$NEW/params_latest.npz" --cls 10 --frames 50 \
  --out runs/diagnose_pitcher_r5.json > runs/diagnose_pitcher_r5.out 2>&1
echo "[posttrain] r5 diagnosis exit=$?: $(date)"

echo "[posttrain] 3/4 hpr6 gate (2k steps + noise arm): $(date)"
timeout 3600 python scripts/validate_hpr6.py --steps 2000 \
  > runs/validate_hpr6_r5.out 2>&1
echo "[posttrain] gate exit=$?: $(date)"

echo "[posttrain] 4/4 bench suite: $(date)"
timeout 3600 python bench_suite.py > runs/bench_r5.out 2>&1
echo "[posttrain] bench exit=$?: $(date)"
echo "[posttrain] QUEUE DONE: $(date)"
