#!/bin/bash
# bf16-D confirm segment (BASELINE.md round-4 bf16-D A/B decision rule):
# 2,400 Stage-C steps on the r3b manifest with GAN.D_DTYPE=compute and
# everything else identical to r3b (seed, data, DAMSM encoders via
# TRAIN.NET_E), evaluated every 600 steps under the fixed protocol.
# Point-for-point comparison target (r3b fp32-D, docs/shakedown/r3b_evals/):
#   step  600: FID 2.270  RP 0.075
#   step 1200: FID 2.164  RP 0.376
#   step 1800: FID 1.388  RP 0.517
#   step 2400: FID 0.911  RP 0.568
# If the bf16-D descent matches (no stall, no divergence, same FID
# trajectory within curve-to-curve noise), the default flips to 'compute'.
#
# Stage-C only: DAMSM comes from the r3b checkpoint (NET_E); box/shape
# are not inputs to gan/main.py. IDEMPOTENT: the trainer no-ops at
# --max_steps, evals are log-guarded. Run under the watchdog:
#   OBJGAN_SHK_DIR=/root/shk5 nohup python docs/shakedown/watchdog_r3.py \
#     docs/shakedown/confirm_bf16d.sh 600,1200,1800,2400 \
#     > /root/shk5/wd_stdout.log 2>&1 & echo $! > /tmp/wd.pid
set -ex
cd "$(dirname "$0")/../.."
M=/root/repo/data_proc2k/manifest.json
C=/root/repo/docs/shakedown/proc5_bf16d.yml
L=/root/shk5
R=/root/repo/docs/shakedown/r4b_bf16d_evals
mkdir -p $L $R

for SEG in 600 1200 1800 2400; do
  python gan/main.py --cfg $C --manifest $M --wire --max_steps $SEG
  grep -aq "^FID" $L/fid_$SEG.log 2>/dev/null || \
    timeout 2400 python gan/eval.py --cfg $C --manifest $M \
        --num_batches 128 --real_stats all | tee $L/fid_$SEG.log
  cp -f $L/fid_$SEG.log $R/ 2>/dev/null || true
done
