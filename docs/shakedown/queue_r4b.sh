#!/bin/bash
# Round-4b queue: after the 10k curve's watchdog exits, run the bf16-D
# confirm segment (confirm_bf16d.sh) under its own watchdog + mirror
# daemon. Idempotent/reset-proof: if the confirm already completed
# (fid_2400 has its FID line) this is a no-op; on a machine reset,
# re-running queue_r4.sh then this fast-forwards both.
#
#   nohup bash docs/shakedown/queue_r4b.sh > /root/shk4b_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/../.."
D=docs/shakedown

# 1. wait out the 10k curve's watchdog (it owns the single chip)
while kill -0 "$(cat /tmp/wd.pid 2>/dev/null)" 2>/dev/null; do sleep 120; done

# 2. launch the confirm segment under the watchdog (+ mirror daemon)
mkdir -p /root/shk5 $D/r4b_bf16d_evals
if ! grep -aq '^FID' /root/shk5/fid_2400.log 2>/dev/null; then
  OBJGAN_SHK_DIR=/root/shk5 nohup python $D/watchdog_r3.py \
    $D/confirm_bf16d.sh 600,1200,1800,2400 \
    > /root/shk5/wd_stdout.log 2>&1 &
  echo $! > /tmp/wd.pid
  nohup bash $D/mirror_evals.sh /root/shk5 $D/r4b_bf16d_evals /tmp/wd.pid \
    > /tmp/mirror_r4b.log 2>&1 &
  echo $! > /tmp/mirror_r4b.pid
fi
