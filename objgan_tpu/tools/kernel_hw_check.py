"""Real-hardware numerics check of the Pallas kernels vs their XLA oracles.

The Pallas kernels (``ops/roi_align.py``, ``ops/groupnorm.py``) are
oracle-tested in interpret mode on CPU, but Mosaic hardware lowering has
failure modes interpret mode does not model (bf16 transcendentals,
sub-128-lane DMA, and — caught by this tool in round 3b — fp32 dot
operands silently run through bf16 MXU passes unless
``precision=HIGHEST``). This tool runs each kernel on the *actual* TPU at
a production-dispatch shape and diffs it against the XLA implementation
executed on the same device:

    python -m objgan_tpu.tools.kernel_hw_check [--c 256] [--o 10]

ROI-align checks, each fwd + grad-wrt-features (C = DF_DIM*4 = 256,
MAX_OBJECTS overlapping boxes):
  * fp32: must match XLA to ~1e-4 (same math, different schedule);
  * bf16 with all boxes overlapping: the backward accumulates o=10
    contributions per feature block and must do so in fp32 — tolerance is
    one final bf16 rounding (rtol 0.01 / atol 0.05, mirroring
    tests/test_ops.py::test_pallas_bf16_grad_accumulates_fp32).

GroupNorm checks (kernel-eligible non-GLU shape, primal only — training
backwards use the XLA reference by construction):
  * fp32 and bf16 vs ``group_norm_reference`` on-device.

Exit code 0 and a PASS line per check on success; non-zero with the max
abs/rel diff on failure. Results belong in BASELINE.md's hardware-check
notes.
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from objgan_tpu.ops import roi_align as ra


def _check(name, feats, boxes, out_size, q, rtol, atol):
    def loss_p(f):
        return jnp.sum(ra.roi_align_pallas(f, boxes, out_size, q)
                       .astype(jnp.float32) ** 2)

    def loss_x(f):
        return jnp.sum(ra.roi_align_xla(f, boxes, out_size, q)
                       .astype(jnp.float32) ** 2)

    # One jitted program per impl: (fwd, grad) together.
    vp = jax.jit(jax.value_and_grad(loss_p))
    vx = jax.jit(jax.value_and_grad(loss_x))
    yp, gp = vp(feats)
    yx, gx = vx(feats)
    gp = np.asarray(gp, np.float32)
    gx = np.asarray(gx, np.float32)
    fwd_rel = abs(float(yp) - float(yx)) / max(abs(float(yx)), 1e-12)
    gdiff = np.abs(gp - gx)
    gtol = atol + rtol * np.abs(gx)
    ok = fwd_rel <= max(rtol, 1e-5) and bool((gdiff <= gtol).all())
    worst = float((gdiff - gtol).max())
    print(f"{'PASS' if ok else 'FAIL'} {name}: fwd_rel={fwd_rel:.3e} "
          f"grad_max_abs_diff={float(gdiff.max()):.3e} "
          f"worst_over_tol={worst:.3e}")
    return ok


def _check_groupnorm(dtype_name):
    from objgan_tpu.ops import groupnorm as gn

    b, h, w, c, groups, eps = 2, 128, 128, 128, 16, 1e-5
    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = (jax.random.normal(k1, (b, h, w, c), jnp.float32) * 3 + 1).astype(dt)
    scale = jax.random.normal(k2, (c,), jnp.float32).astype(dt)
    bias = jax.random.normal(k3, (c,), jnp.float32).astype(dt)
    if not gn.INTERPRET and not gn._pallas_eligible(x, groups, False):
        print(f"SKIP groupnorm {dtype_name}: shape not kernel-eligible")
        return True
    yk = jax.jit(lambda a, s, bb: gn._group_norm_kernel_op(
        a, s, bb, groups, eps, False))(x, scale, bias)
    yr = jax.jit(lambda a, s, bb: gn.group_norm_reference(
        a, s, bb, groups, eps, False))(x, scale, bias)
    yk = np.asarray(yk, np.float32)
    yr = np.asarray(yr, np.float32)
    rtol, atol = (1e-5, 1e-5) if dtype_name == "fp32" else (1e-2, 1e-2)
    diff = np.abs(yk - yr)
    tol = atol + rtol * np.abs(yr)
    ok = bool((diff <= tol).all())
    print(f"{'PASS' if ok else 'FAIL'} groupnorm {dtype_name}: "
          f"max_abs_diff={float(diff.max()):.3e} "
          f"worst_over_tol={float((diff - tol).max()):.3e}")
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=256,
                    help="channels (multiple of 128 keeps the kernel path)")
    ap.add_argument("--o", type=int, default=10, help="objects per image")
    ap.add_argument("--out_size", type=int, default=7)
    ap.add_argument("--q", type=int, default=2, help="sampling ratio")
    args = ap.parse_args(argv)

    dev = jax.devices()[0]
    print(f"device: {dev} (platform={dev.platform})")
    if dev.platform not in ("tpu", "axon"):
        print("WARNING: not a TPU — this exercises the same dispatch "
              "lax.platform_dependent resolves to XLA on this platform, "
              "so the check is vacuous here.")
    if args.c % 128 != 0:
        print(f"ERROR: --c {args.c} is not a multiple of 128; "
              "roi_align would dispatch to XLA, making the check vacuous.")
        return 2

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    b, h, w = 4, 16, 16
    feats32 = jax.random.normal(k1, (b, h, w, args.c), jnp.float32)
    # heavy overlap: every box covers the same region -> o-way accumulation
    boxes = jnp.tile(jnp.array([[[0.1, 0.1, 0.8, 0.8]]]), (b, args.o, 1))
    # plus distinct boxes in the first rows so the fwd isn't degenerate
    xy = jax.random.uniform(k2, (b, args.o, 2), minval=0.0, maxval=0.5)
    wh = jnp.full((b, args.o, 2), 0.4)
    boxes_distinct = jnp.concatenate([xy, wh], axis=-1)

    ok = _check("roi fp32 distinct-boxes", feats32, boxes_distinct,
                args.out_size, args.q, rtol=1e-4, atol=1e-4)
    ok &= _check("roi bf16 overlapping-boxes (fp32 accum)",
                 feats32.astype(jnp.bfloat16), boxes,
                 args.out_size, args.q, rtol=0.01, atol=0.05)
    ok &= _check_groupnorm("fp32")
    ok &= _check_groupnorm("bf16")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
