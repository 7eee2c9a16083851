#!/bin/bash
# Round-5 eval-protocol noise floor (companion to run_phases_r5_100k.sh).
#
# The 100k curve's open question is whether the post-8k lite-FID drift
# (+0.014 from 0.100@8k to 0.114@14k on the truncated run) is signal or
# protocol noise. This re-scores ONE checkpoint (whatever the finished
# curve left in $L/proc7_gan/ckpt) under several --eval_seed values:
# same split, same real-side statistics, different held-out batch order
# and latents. The seed-to-seed spread IS the error bar a cross-
# checkpoint delta must clear (gan/eval.py --eval_seed docstring).
#
# Run AFTER the curve completes (TPU must be free):
#   bash docs/shakedown/noise_floor_r5.sh
# Idempotent: each seed's log is grep-guarded like the curve evals.
set -ex
cd "$(dirname "$0")/../.."
M=/root/repo/data_proc100k/manifest.json
C=/root/repo/docs/shakedown/proc7_100k.yml
L=/root/shk7
R=/root/repo/docs/shakedown/r5_evals
mkdir -p $L $R
for f in $R/noise_*.log; do
  [ -e "$f" ] && [ ! -e "$L/$(basename $f)" ] && cp "$f" "$L/"
done
for SEED in 101 202 303; do
  grep -aq "^FID" $L/noise_seed$SEED.log 2>/dev/null || \
    timeout 5400 python gan/eval.py --cfg $C --manifest $M \
        --num_batches 128 --real_stats all --eval_seed $SEED \
        | tee $L/noise_seed$SEED.log
  cp -f $L/noise_seed$SEED.log $R/ 2>/dev/null || true
done
# default-seed score of the same checkpoint = the curve's last eval point
# (fid_24000.log); together: 4 draws of lite-FID at one checkpoint.
