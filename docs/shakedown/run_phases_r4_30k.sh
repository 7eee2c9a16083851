#!/bin/bash
# Round-4 data-scaling curve, step 3: 30k records (15x r3b, 3x the 10k
# run). Two questions, one run:
#   1. Does quality keep scaling with data? (2k plateau 0.296 -> 10k
#      plateau ~0.100, still descending at cutoff — BASELINE.md round 4.)
#   2. Does the flipped GAN.D_DTYPE='compute' default (bf16 D) hold a
#      clean 24k-step curve at scale? (The flip was confirmed at 7,200
#      steps on 2k data; this is the long-horizon confirm for free.)
# Protocol matches proc4_10k: n=2048 evals (128 batches x 16),
# full-manifest real stats (computed once, disk-cached), probe lite-IS,
# R-precision + real-image ceiling.
#
# Reset-proof: dataset regenerates deterministically (--seed 5), configs
# live in-repo, eval logs mirrored into docs/shakedown/r4c_evals by
# mirror_evals.sh. IDEMPOTENT: trainers no-op at --max_steps, evals are
# log-guarded; a relaunch fast-forwards.
#
# Run under the watchdog:
#   mkdir -p /root/shk6
#   OBJGAN_SHK_DIR=/root/shk6 nohup python docs/shakedown/watchdog_r3.py \
#     docs/shakedown/run_phases_r4_30k.sh \
#     2000,4000,6000,8000,10000,12000,14000,16000,18000,20000,22000,24000 \
#     > /root/shk6/wd_stdout.log 2>&1 & echo $! > /tmp/wd.pid
#   nohup bash docs/shakedown/mirror_evals.sh /root/shk6 \
#     docs/shakedown/r4c_evals > /tmp/mirror.log 2>&1 &
set -ex
cd "$(dirname "$0")/../.."
D=/root/repo/data_proc30k
M=$D/manifest.json
C=/root/repo/docs/shakedown/proc6_30k.yml
L=/root/shk6
R=/root/repo/docs/shakedown/r4c_evals
mkdir -p $L $R

# deterministic 30k dataset (~30 min on this 1-core host; guarded by count)
python - <<'EOF'
import json, os, sys
m = "/root/repo/data_proc30k/manifest.json"
if os.path.exists(m) and len(json.load(open(m))) == 30000:
    print("dataset: 30k manifest present"); sys.exit(0)
sys.argv = ["procedural", "--out", "/root/repo/data_proc30k",
            "--n", "30000", "--seed", "5"]
from objgan_tpu.data.procedural import main
main()
EOF

python gan/pretrain_DAMSM.py --cfg $C --manifest $M --wire --max_steps 3000
python box_generation/train.py --cfg $C --manifest $M --max_steps 3000
python shape_generation/main.py --cfg $C --manifest $M --max_steps 1500
# Stage-C in 2000-step segments (1875 steps/epoch at 30k/16 => ~12.8 epochs)
for SEG in 2000 4000 6000 8000 10000 12000 14000 16000 18000 20000 22000 24000; do
  python gan/main.py --cfg $C --manifest $M --wire --max_steps $SEG
  grep -aq "^FID" $L/fid_$SEG.log 2>/dev/null || \
    timeout 3600 python gan/eval.py --cfg $C --manifest $M \
        --num_batches 128 --real_stats all | tee $L/fid_$SEG.log
  cp -f $L/fid_$SEG.log $R/ 2>/dev/null || true
done
