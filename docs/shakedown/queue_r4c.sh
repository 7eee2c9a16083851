#!/bin/bash
# Round-4c queue: wait out the official round-4 bench run (it owns the
# single chip), then launch the 30k-record data-scaling curve
# (run_phases_r4_30k.sh) under the watchdog + eval-mirror daemon.
# Idempotent/reset-proof: if the curve already completed (fid_24000 has
# its FID line) this is a no-op; after a machine reset just re-run this
# script — the recipe fast-forwards.
#
#   nohup bash docs/shakedown/queue_r4c.sh <bench_pid> \
#     > /root/shk6_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/../.."
D=docs/shakedown
BENCH_PID=${1:-0}

# 1. wait for the bench to release the chip (pid 0 = no bench running)
while [ "$BENCH_PID" != 0 ] && kill -0 "$BENCH_PID" 2>/dev/null; do
  sleep 60
done

# 2. launch the 30k curve under the watchdog (+ mirror daemon)
mkdir -p /root/shk6 $D/r4c_evals
if ! grep -aq '^FID' /root/shk6/fid_24000.log 2>/dev/null; then
  OBJGAN_SHK_DIR=/root/shk6 nohup python $D/watchdog_r3.py \
    $D/run_phases_r4_30k.sh \
    2000,4000,6000,8000,10000,12000,14000,16000,18000,20000,22000,24000 \
    > /root/shk6/wd_stdout.log 2>&1 &
  echo $! > /tmp/wd.pid
  nohup bash $D/mirror_evals.sh /root/shk6 $D/r4c_evals /tmp/wd.pid \
    > /tmp/mirror_r4c.log 2>&1 &
  echo $! > /tmp/mirror_r4c.pid
fi
