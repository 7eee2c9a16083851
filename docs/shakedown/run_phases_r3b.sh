#!/bin/bash
# Round-3b shakedown restart: fresh quality curve with the FIXED object-D
# class head (ROI-only features) and augmentation-free eval feeds — the
# late-round-3 semantic fixes made the original r3 curve non-comparable
# (BASELINE.md "round-3 review fix" note). The 08-18 machine reset wiped
# /root/shk3, so this restart recreates it from the in-repo configs
# (docs/shakedown/proc3.yml — the durable copies).
#
# Differences from run_phases_r3.sh:
#   - configs come from the repo, not /root/shk3 (reset-proof);
#   - the diag-vs-corr box-GMM ablation arm is skipped (already answered,
#     BASELINE.md ablation table; corr is the default now);
#   - eval logs are mirrored into docs/shakedown/r3b_evals/ so a reset
#     can't lose the curve again (checkpoints stay in scratch).
#
# IDEMPOTENT: trainer CLIs no-op when their checkpoint satisfies
# --max_steps; every eval is guarded by its log file. After a relay hang,
# kill the stuck PID and re-run; it fast-forwards.
set -ex
cd "$(dirname "$0")/../.."
M=/root/repo/data_proc2k/manifest.json
C=/root/repo/docs/shakedown/proc3.yml
L=/root/shk3
R=/root/repo/docs/shakedown/r3b_evals
mkdir -p $L $R
python gan/pretrain_DAMSM.py --cfg $C --manifest $M --wire --max_steps 1600
python box_generation/train.py --cfg $C --manifest $M --max_steps 1600
python shape_generation/main.py --cfg $C --manifest $M --max_steps 800
# Stage-C in 600-step segments; each eval draws 128 batches x 16 = 2048
# samples (lite-FID, real-side stats over the full manifest) and 2048
# R-precision pairs off the held-out split.
for SEG in 600 1200 1800 2400 3000 3600 4200 4800 5400 6000 6600 7200; do
  python gan/main.py --cfg $C --manifest $M --wire --max_steps $SEG
  grep -aq "^FID" $L/fid_$SEG.log 2>/dev/null || \
    timeout 2400 python gan/eval.py --cfg $C --manifest $M \
        --num_batches 128 --real_stats all | tee $L/fid_$SEG.log
  cp -f $L/fid_$SEG.log $R/ 2>/dev/null || true
done
