#!/bin/bash
# bf16-D confirm EXTENSION: the 2,400-step confirm segment showed bf16-D
# FID lagging 2x mid-descent (1.882 vs fp32-D's 0.911 at step 2400) while
# R-precision matched or led (0.482 vs 0.376 at 1200) — dynamics differ,
# and the flip decision must rest on the PLATEAU, not the mid-descent
# where FID sensitivity is highest. This extends the same run to 7,200
# steps for a point-for-point plateau comparison against r3b fp32-D:
#   3000: 0.659  3600: 0.495  4200: 0.429  4800: 0.367
#   5400: 0.335  6000: 0.312  6600: 0.302  7200: 0.296  (FID, RP ~0.556)
# Decision: flip GAN.D_DTYPE default to 'compute' ONLY if the bf16-D
# plateau lands within curve noise of 0.296/0.556; otherwise fp32-D stays
# the default and the +8% step-time win is documented as quality-gated.
# IDEMPOTENT (trainer no-ops at --max_steps, evals log-guarded):
#   OBJGAN_SHK_DIR=/root/shk5 nohup python docs/shakedown/watchdog_r3.py \
#     docs/shakedown/confirm_bf16d_ext.sh 3000,3600,4200,4800,5400,6000,6600,7200 \
#     > /root/shk5/wd_ext_stdout.log 2>&1 & echo $! > /tmp/wd.pid
set -ex
cd "$(dirname "$0")/../.."
M=/root/repo/data_proc2k/manifest.json
C=/root/repo/docs/shakedown/proc5_bf16d.yml
L=/root/shk5
R=/root/repo/docs/shakedown/r4b_bf16d_evals
mkdir -p $L $R

for SEG in 3000 3600 4200 4800 5400 6000 6600 7200; do
  python gan/main.py --cfg $C --manifest $M --wire --max_steps $SEG
  grep -aq "^FID" $L/fid_$SEG.log 2>/dev/null || \
    timeout 2400 python gan/eval.py --cfg $C --manifest $M \
        --num_batches 128 --real_stats all | tee $L/fid_$SEG.log
  cp -f $L/fid_$SEG.log $R/ 2>/dev/null || true
done
