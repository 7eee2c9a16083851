#!/bin/bash
# Round-4 quality curve at 10k records (5x the r3b data) — VERDICT r3 next
# #6: prove the quality machinery LEARNS at scale, not just that the
# loaders keep up (that was measured in r3). Protocol matches r3b: n=2048
# evals (128 batches x 16), real-side stats over the full manifest
# (computed once, disk-cached), probe-based lite-IS, R-precision +
# real-image ceiling.
#
# Reset-proof: the dataset regenerates deterministically (--seed 4), the
# configs live in-repo, eval logs are mirrored into docs/shakedown/r4_evals
# (and committed by mirror_evals.sh). IDEMPOTENT: trainers no-op at
# --max_steps, evals are log-guarded; a relaunch fast-forwards.
#
# Run under the watchdog:
#   OBJGAN_SHK_DIR=/root/shk4 nohup python docs/shakedown/watchdog_r3.py \
#     docs/shakedown/run_phases_r4_10k.sh \
#     1000,2000,3000,4000,5000,6000,7000,8000,9000,10000,11000,12000 \
#     > /root/shk4/wd_stdout.log 2>&1 & echo $! > /tmp/wd.pid
set -ex
cd "$(dirname "$0")/../.."
D=/root/repo/data_proc10k
M=$D/manifest.json
C=/root/repo/docs/shakedown/proc4_10k.yml
L=/root/shk4
R=/root/repo/docs/shakedown/r4_evals
mkdir -p $L $R

# Protocol bisect (VERDICT r3 weak #3): score the FINAL r3b checkpoint
# under the PRE-FIX augmented eval protocol (--aug_eval). The r3b curve
# lags the pre-fix r3 curve; the pre-fix checkpoints are gone, but the
# delta (standard fid_7200 vs this) measures how much of the lag is the
# eval-protocol fix rather than the class-head training fix.
grep -aq '^FID' docs/shakedown/r3b_evals/fid_7200_aug.log 2>/dev/null || \
  timeout 3600 python gan/eval.py --cfg docs/shakedown/proc3.yml \
      --manifest /root/repo/data_proc2k/manifest.json \
      --num_batches 128 --real_stats all --aug_eval \
    | tee docs/shakedown/r3b_evals/fid_7200_aug.log

# deterministic 10k dataset (~10 min; guarded by record count)
python - <<'EOF'
import json, os, sys
m = "/root/repo/data_proc10k/manifest.json"
if os.path.exists(m) and len(json.load(open(m))) == 10000:
    print("dataset: 10k manifest present"); sys.exit(0)
sys.argv = ["procedural", "--out", "/root/repo/data_proc10k",
            "--n", "10000", "--seed", "4"]
from objgan_tpu.data.procedural import main
main()
EOF

python gan/pretrain_DAMSM.py --cfg $C --manifest $M --wire --max_steps 3000
python box_generation/train.py --cfg $C --manifest $M --max_steps 3000
python shape_generation/main.py --cfg $C --manifest $M --max_steps 1500
# Stage-C in 1000-step segments (625 steps/epoch at 10k/16 => ~19 epochs)
for SEG in 1000 2000 3000 4000 5000 6000 7000 8000 9000 10000 11000 12000; do
  python gan/main.py --cfg $C --manifest $M --wire --max_steps $SEG
  grep -aq "^FID" $L/fid_$SEG.log 2>/dev/null || \
    timeout 3600 python gan/eval.py --cfg $C --manifest $M \
        --num_batches 128 --real_stats all | tee $L/fid_$SEG.log
  cp -f $L/fid_$SEG.log $R/ 2>/dev/null || true
done
