#!/bin/bash
# Round-5 data-scaling curve, step 4: 100k records (3.3x the 30k run,
# 50x r3b). VERDICT r4 next #3 — two questions, one run:
#   1. Does quality keep scaling with data at real-COCO scale? (2k
#      plateau 0.296 -> 10k 0.100 -> 30k 0.065-at-truncation.)
#   2. Does bf16-D hold a full 0->plateau horizon? (The 30k confirm was
#      reset-truncated at 14k/24k steps.)
# Round-5 eval additions land on every point automatically: frozen
# cross-manifest lite-IS (assets/frozen_lite.npz, committed) and
# full-pool retrieval mean rank (gan/eval.py).
#
# Reset-proof: dataset regenerates deterministically (--seed 7), configs
# live in-repo, eval logs mirrored into docs/shakedown/r5_evals by
# mirror_evals.sh. IDEMPOTENT: trainers no-op at --max_steps, evals are
# log-guarded; a relaunch fast-forwards.
#
# Run under the watchdog:
#   mkdir -p /root/shk7
#   OBJGAN_SHK_DIR=/root/shk7 nohup python docs/shakedown/watchdog_r3.py \
#     docs/shakedown/run_phases_r5_100k.sh \
#     2000,4000,6000,8000,10000,12000,14000,16000,18000,20000,22000,24000 \
#     > /root/shk7/wd_stdout.log 2>&1 & echo $! > /tmp/wd.pid
#   nohup bash docs/shakedown/mirror_evals.sh /root/shk7 \
#     docs/shakedown/r5_evals > /tmp/mirror.log 2>&1 &
set -ex
cd "$(dirname "$0")/../.."
D=/root/repo/data_proc100k
M=$D/manifest.json
C=/root/repo/docs/shakedown/proc7_100k.yml
L=/root/shk7
R=/root/repo/docs/shakedown/r5_evals
mkdir -p $L $R

# After a machine reset $L is wiped but completed eval logs live on in
# $R (the mirror daemon committed them). Restore them so the log guard
# below fast-forwards past already-scored checkpoints — training still
# redoes 0->N (checkpoints are gone), but with RNG_SEED pinned the rerun
# statistically reproduces the original; the spliced curve is documented
# in BASELINE.md.
for f in $R/fid_*.log; do
  [ -e "$f" ] && [ ! -e "$L/$(basename $f)" ] && cp "$f" "$L/"
done

# deterministic 100k dataset (~90 min on this 1-core host; guarded by count)
python - <<'EOF'
import json, os, sys
m = "/root/repo/data_proc100k/manifest.json"
if os.path.exists(m) and len(json.load(open(m))) == 100000:
    print("dataset: 100k manifest present"); sys.exit(0)
sys.argv = ["procedural", "--out", "/root/repo/data_proc100k",
            "--n", "100000", "--seed", "7"]
from objgan_tpu.data.procedural import main
main()
EOF

python gan/pretrain_DAMSM.py --cfg $C --manifest $M --wire --max_steps 3000
python box_generation/train.py --cfg $C --manifest $M --max_steps 3000
python shape_generation/main.py --cfg $C --manifest $M --max_steps 1500
# Stage-C in 2000-step segments (6250 steps/epoch at 100k/16 => ~3.8 epochs)
for SEG in 2000 4000 6000 8000 10000 12000 14000 16000 18000 20000 22000 24000; do
  python gan/main.py --cfg $C --manifest $M --wire --max_steps $SEG
  grep -aq "^FID" $L/fid_$SEG.log 2>/dev/null || \
    timeout 5400 python gan/eval.py --cfg $C --manifest $M \
        --num_batches 128 --real_stats all | tee $L/fid_$SEG.log
  cp -f $L/fid_$SEG.log $R/ 2>/dev/null || true
done
