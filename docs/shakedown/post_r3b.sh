#!/bin/bash
# Post-curve TPU queue (CLAUDE.md round-3 items 1-2), run AFTER the r3b
# shakedown finishes so it never contends with the curve for the single
# chip. Designed to run unattended behind the watchdog:
#
#   nohup bash -c 'while kill -0 $(cat /tmp/wd.pid) 2>/dev/null; do \
#       sleep 120; done; bash docs/shakedown/post_r3b.sh' &
#
# Each item tees into docs/shakedown/ so the driver's end-of-round snapshot
# commits the raw numbers even if no builder session is alive to curate
# them into BASELINE.md. Idempotent: items skip when their log already has
# the final JSON line.
set -x
cd "$(dirname "$0")/../.."
D=docs/shakedown

# 1. Per-stage breakdown + roofline of the sampling and train steps
#    (~11 extra programs; multi-minute remote compiles each, cold cache).
grep -q '"metric"' $D/bench_breakdown_r3b.log 2>/dev/null || \
  timeout 5400 python bench.py --breakdown --analyze --no_feed \
    2>&1 | tee $D/bench_breakdown_r3b.log

# 2. bf16-discriminator A/B: fp32-D baseline vs bf16-D trunk. The train
#    step is HBM-bound, so halving D-trunk bytes is the one unrefuted
#    roofline idea. Decision rule (CLAUDE.md): flip GAN.D_DTYPE default
#    only if bf16 wins AND the curve comparison stays clean — never
#    mid-curve, and the r3b curve is done by the time this runs.
grep -q '"metric"' $D/bench_d_fp32_r3b.log 2>/dev/null || \
  timeout 3600 python bench.py --no_feed 2>&1 | tee $D/bench_d_fp32_r3b.log
grep -q '"metric"' $D/bench_d_bf16_r3b.log 2>/dev/null || \
  timeout 3600 python bench.py --no_feed --d_dtype compute \
    2>&1 | tee $D/bench_d_bf16_r3b.log
