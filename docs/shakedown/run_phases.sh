#!/bin/bash
# The exact four-phase shakedown recipe behind BASELINE.md's round-2
# section. Dataset first:
#   python -m objgan_tpu.data.procedural --out /tmp/proc_coco --n 200
# proc.yml: CONFIG_NAME/OUTPUT_DIR/DATA_DIR/RNG_SEED + TRAIN:
# {BATCH_SIZE: 16, STEPS_PER_EXECUTION: 8, SNAPSHOT_STEPS: 300}.
set -ex
cd "$(dirname "$0")/../.."
M=/tmp/proc_coco/manifest.json
C=/tmp/shakedown/proc.yml
L=/tmp/shakedown
python gan/pretrain_DAMSM.py --cfg $C --manifest $M --grain --max_steps 1600
python box_generation/train.py --cfg $C --manifest $M --max_steps 1600
python shape_generation/main.py --cfg $C --manifest $M --max_steps 800
# Stage-C in 600-step segments with a lite-FID/R-precision point after
# each (resume is automatic; retry any eval that hangs on a lost relay RPC)
for SEG in 600 1200 1800 2400 3000 3600 4200 4800 5400 6000; do
  python gan/main.py --cfg $C --manifest $M --grain --max_steps $SEG
  timeout 900 python gan/eval.py --cfg $C --manifest $M --num_batches 8 \
      | tee $L/fid_$SEG.log
done
