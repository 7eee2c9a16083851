#!/bin/bash
# Round-3 four-phase shakedown: 2,000-record procedural COCO, wire-format
# feed, and a statistically defensible eval protocol (>=2048 samples /
# >=2048 R-precision pairs per point — VERDICT r2 "next" #2). Dataset:
#   python -m objgan_tpu.data.procedural --out /root/repo/data_proc2k --n 2000
# proc3.yml: CONFIG_NAME/OUTPUT_DIR/DATA_DIR/RNG_SEED + B_VALIDATION: true +
# TRAIN: {BATCH_SIZE: 16, STEPS_PER_EXECUTION: 8, SNAPSHOT_STEPS: 300}.
#
# IDEMPOTENT: trainer CLIs no-op instantly when their checkpoint already
# satisfies --max_steps (cli._already_trained), and every eval is guarded
# by its log file — so after a TPU-relay hang (see CLAUDE.md), kill the
# stuck PID and just re-run this script; it fast-forwards to where it died.
set -ex
cd "$(dirname "$0")/../.."
M=/root/repo/data_proc2k/manifest.json
C=/root/shk3/proc3.yml
L=/root/shk3
python gan/pretrain_DAMSM.py --cfg $C --manifest $M --wire --max_steps 1600
python box_generation/train.py --cfg $C --manifest $M --max_steps 1600
# corr-GMM ablation arm (separate CONFIG_NAME -> separate checkpoints)
python box_generation/train.py --cfg /root/shk3/proc3_corr.yml \
    --manifest $M --max_steps 1600
grep -aq heldout_box_nll $L/box_eval_diag.log 2>/dev/null || \
  python box_generation/sample.py --cfg $C --manifest $M --eval \
      --num_batches 12 | tee $L/box_eval_diag.log
grep -aq heldout_box_nll $L/box_eval_corr.log 2>/dev/null || \
  python box_generation/sample.py --cfg /root/shk3/proc3_corr.yml \
      --manifest $M --eval --num_batches 12 | tee $L/box_eval_corr.log
python shape_generation/main.py --cfg $C --manifest $M --max_steps 800
# Stage-C in 600-step segments; each eval draws 128 batches x 16 = 2048
# samples (lite-FID, real-side stats over the full 2000-image manifest)
# and 2048 R-precision pairs off the held-out split
for SEG in 600 1200 1800 2400 3000 3600 4200 4800 5400 6000 6600 7200 7800; do
  python gan/main.py --cfg $C --manifest $M --wire --max_steps $SEG
  grep -aq "^FID" $L/fid_$SEG.log 2>/dev/null || \
    timeout 2400 python gan/eval.py --cfg $C --manifest $M \
        --num_batches 128 --real_stats all | tee $L/fid_$SEG.log
done
