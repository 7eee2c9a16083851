#!/bin/bash
# Round-4 TPU queue orchestrator: after the r3b curve finishes and the
# armed post-curve bench queue (post_r3b.sh, run by its own waiter) has
# produced both decision logs, launch the 10k-record quality curve under
# the watchdog, with its own eval-log mirror daemon. Idempotent and
# reset-proof: re-running it skips straight to whatever remains.
#
#   nohup bash docs/shakedown/queue_r4.sh > /root/shk4_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/../.."
D=docs/shakedown

# 1. r3b watchdog still running? wait it out.
while kill -0 "$(cat /tmp/wd.pid 2>/dev/null)" 2>/dev/null; do sleep 120; done

# 2. post_r3b queue: wait for both final JSON lines, with a hard deadline
#    (the benches have their own `timeout`s; if they died without output
#    we proceed anyway — the curve is the primary deliverable).
DEADLINE=$(( $(date +%s) + 14400 ))
until grep -q '"metric"' $D/bench_breakdown_r3b.log 2>/dev/null \
   && grep -q '"metric"' $D/bench_d_bf16_r3b.log 2>/dev/null; do
  [ "$(date +%s)" -ge "$DEADLINE" ] && break
  sleep 120
done

# 3. launch the 10k curve under the watchdog (+ mirror daemon)
mkdir -p /root/shk4 docs/shakedown/r4_evals
if ! grep -aq '^FID' /root/shk4/fid_12000.log 2>/dev/null; then
  OBJGAN_SHK_DIR=/root/shk4 nohup python $D/watchdog_r3.py \
    $D/run_phases_r4_10k.sh \
    1000,2000,3000,4000,5000,6000,7000,8000,9000,10000,11000,12000 \
    > /root/shk4/wd_stdout.log 2>&1 &
  echo $! > /tmp/wd.pid
  nohup bash $D/mirror_evals.sh /root/shk4 $D/r4_evals /tmp/wd.pid \
    > /tmp/mirror_r4.log 2>&1 &
  echo $! > /tmp/mirror.pid
fi
