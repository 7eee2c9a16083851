"""Fused single-read GroupNorm(+GLU) — the generator's HBM-bandwidth fix.

The 256px sampling pipeline is bandwidth-bound (BASELINE.md: ~68% of v5e
peak). XLA lowers ``GroupNorm -> GLU`` as two passes over the conv output in
HBM: a reduce pass for the statistics and an elementwise normalize+GLU pass —
the tensor is READ TWICE. This kernel reads it once per batch element:

    grid (B,):  x[b] (N, C) --chunked DMA--> VMEM scratch (stays resident)
                pass 1: per-chunk fp32 sum / sum-of-squares (overlapped with
                        the remaining input DMAs)
                pass 2: normalize (+ optional GLU) from the resident copy,
                        double-buffered chunk DMAs back to HBM

HBM traffic per call: 1R + 1W(out) vs XLA's 2R + 1W. The round-1 analysis
projected ~0.5-1 ms of the 13.5 ms sampling step from this; v5e
measurement says otherwise — XLA overlaps its two passes well enough that
the kernel only wins on non-GLU fold<=2 shapes (see ``_pallas_eligible``
for the numbers), and dispatch is restricted to exactly that regime. The
GLU epilogue (selection matmuls) is kept: it is interpret-verified,
reachable by flipping eligibility, and documents why the wider fusion
does not pay.

Inputs are viewed as (N/fold, C*fold) with the smallest power-of-two fold
that makes both C*fold and out_C*fold multiples of the 128-lane tile:
Mosaic can only DMA-slice VMEM at lane-tile granularity, so narrow channels
AND narrow GLU outputs (out_C = C/2 — e.g. C=128 -> 64) must be folded or
the kernel is a hard compile error on hardware. The group statistics fold
the replicated channel segments back together (``j % C`` in the membership
matrix), so the math is identical to the unfolded layout.

Semantics are exactly ``flax.linen.GroupNorm`` (fp32 stats via
E[x^2]-E[x]^2 with the same eps/clamping) optionally followed by ``glu``;
the XLA reference path below is used on CPU, for tiny inputs, and as the
custom-VJP backward (recompute). Verified against flax in
tests/test_groupnorm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the resident slice (bytes); v5e has ~16 MB of VMEM and the
# kernel additionally needs the staging buffers + loop temporaries.
_VMEM_SLICE_BUDGET = 9 * 1024 * 1024
_CHUNKS = 8
_MIN_ROWS = 2048  # below this the kernel's fixed overhead beats the saving

# Tests flip this to run the kernel in interpreter mode on CPU.
INTERPRET = False


def group_norm_reference(x, scale, bias, num_groups: int, eps: float,
                         use_glu: bool):
    """Bit-faithful replica of ``flax.linen.GroupNorm`` (+ optional GLU).

    Stats in fp32 over (spatial..., channels-within-group) using
    E[x^2] - E[x]^2 clamped at zero — flax's ``_compute_stats`` formula —
    then cast back to x.dtype before the GLU gate, matching the unfused
    ``gn() -> glu()`` call sites this kernel replaces."""
    orig_shape = x.shape
    c = orig_shape[-1]
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(orig_shape[0], -1, num_groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y.reshape(orig_shape) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32)
    y = y.astype(x.dtype)
    if use_glu:
        a, g = jnp.split(y, 2, axis=-1)
        return a * jax.nn.sigmoid(g)
    return y


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _kernel(x_hbm, scale_ref, bias_ref, out_hbm, x_vmem, stage, sem_in,
            sem_out, *, n2, c2, true_c, groups, cg, fold, chunks, eps,
            use_glu):
    b = pl.program_id(0)
    r = n2 // chunks

    def in_dma(t):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * r, r), :],
            x_vmem.at[pl.ds(t * r, r), :],
            sem_in.at[t],
        )

    # queue ALL input chunk DMAs up front; stats compute overlaps the tail
    for t in range(chunks):
        in_dma(t).start()

    # pass 1: fp32 channel sums / sums-of-squares, chunk by chunk
    def stat_body(i, carry):
        s, ss = carry
        in_dma(i).wait()
        xc = x_vmem[pl.ds(i * r, r), :].astype(jnp.float32)
        return (s + jnp.sum(xc, axis=0, keepdims=True),
                ss + jnp.sum(xc * xc, axis=0, keepdims=True))

    zero = jnp.zeros((1, c2), jnp.float32)
    s, ss = jax.lax.fori_loop(0, chunks, stat_body, (zero, zero))

    # folded channel sums -> group stats -> per-(folded-)channel affine, via
    # one-hot matmuls (group reshapes would fight Mosaic's lane layout;
    # these are (1,C)-sized — tiny). Column j holds true channel j % true_c.
    gi = lax.broadcasted_iota(jnp.int32, (groups, c2), 0)
    ci = lax.broadcasted_iota(jnp.int32, (groups, c2), 1)
    member = ((ci % true_c) // cg == gi).astype(jnp.float32)  # (G, C2)
    cnt = jnp.float32(n2 * fold * cg)
    # HIGHEST precision: on hardware Mosaic runs fp32 dot operands through
    # bf16 MXU passes by default (~4e-3 relative error — caught on the ROI
    # kernel by tools/roi_hw_check.py). These dots carry real fp32 data
    # (sums / rsqrt stats) and are (1,C)-tiny, so exactness is free.
    _hi = lax.Precision.HIGHEST
    gmean = jnp.dot(s, member.T, preferred_element_type=jnp.float32,
                    precision=_hi) / cnt
    gmean2 = jnp.dot(ss, member.T, preferred_element_type=jnp.float32,
                     precision=_hi) / cnt
    gvar = jnp.maximum(gmean2 - gmean * gmean, 0.0)
    ginv = lax.rsqrt(gvar + eps)  # (1, G)
    inv_c = jnp.dot(ginv, member, preferred_element_type=jnp.float32,
                    precision=_hi)
    mean_c = jnp.dot(gmean, member, preferred_element_type=jnp.float32,
                     precision=_hi)
    a_c = inv_c * scale_ref[...].astype(jnp.float32)         # (1, C2)
    b_c = bias_ref[...].astype(jnp.float32) - mean_c * a_c   # (1, C2)

    # pass 2: normalize (+GLU) from the resident copy; 2-slot output DMAs
    def out_dma(slot, t):
        return pltpu.make_async_copy(
            stage.at[slot],
            out_hbm.at[b, pl.ds(t * r, r), :],
            sem_out.at[slot],
        )

    half = true_c // 2
    if use_glu:
        # GLU halves are gathered with 0/1 selection matmuls instead of lane
        # slices: output column j = k*half + m selects input column
        # k*true_c + m (value half) / + half (gate). With fold > 1 the
        # slices sit at `half`-lane offsets (32/64), and sub-128-lane
        # slicing + concat lowers to lane shuffles that made the kernel
        # 2.3x SLOWER than XLA; the two (r, c2) @ (c2, out_c2) selection
        # matmuls ride the MXU and are ~free at these sizes.
        out_c2 = fold * half
        src = lax.broadcasted_iota(jnp.int32, (c2, out_c2), 0)
        dst = lax.broadcasted_iota(jnp.int32, (c2, out_c2), 1)
        col = (dst // half) * true_c + dst % half
        sel_a = (src == col).astype(jnp.float32)
        sel_g = (src == col + half).astype(jnp.float32)

    def write_body(i, _):
        slot = i % 2

        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        y = x_vmem[pl.ds(i * r, r), :].astype(jnp.float32) * a_c + b_c
        y = y.astype(stage.dtype)
        if use_glu:
            # gate math in fp32 (Mosaic mis-lowers logistic on bf16
            # vectors) with explicit roundings at the same points as the
            # bf16 reference — logistic and multiply on TPU are f32
            # internally, so round(f32 op) is the bf16 op bit-for-bit.
            yf = y.astype(jnp.float32)
            # HIGHEST: exact for bf16 stage dtype either way (0/1 selection,
            # one term per output), but fp32 stage data would be truncated
            # to bf16 passes at default precision (roi_hw_check finding).
            a = jnp.dot(yf, sel_a, preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
            g = jnp.dot(yf, sel_g, preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
            sig = jax.nn.sigmoid(g).astype(stage.dtype).astype(jnp.float32)
            y = (a * sig).astype(stage.dtype)
        stage[slot] = y
        out_dma(slot, i).start()
        return 0

    jax.lax.fori_loop(0, chunks, write_body, 0)
    out_dma(chunks % 2, chunks - 2).wait()
    out_dma((chunks - 1) % 2, chunks - 1).wait()


def _fold_factor(n: int, c: int, out_c: int) -> int:
    """Smallest power-of-two row fold making BOTH the input minor dim
    (c*fold) and the output minor dim (out_c*fold) multiples of the 128-lane
    tile. Mosaic can only DMA-slice VMEM buffers at lane-tile granularity —
    an unaligned staging buffer is a hard compile error on hardware ("Slice
    shape along dimension 2 must be aligned to tiling (128)"), so GLU
    outputs (out_c = c/2) force a fold even when c itself is >= 128.
    Returns 0 when no admissible fold exists."""
    fold = 1
    while fold <= 128:
        if (c * fold) % 128 == 0 and (out_c * fold) % 128 == 0 \
                and n % (fold * _CHUNKS) == 0:
            return fold
        fold *= 2
    return 0


def _pallas_group_norm(x3, scale, bias, num_groups, eps, use_glu):
    """x3: (B, N, C). Returns (B, N, C) or (B, N, C//2) with GLU."""
    b, n, c = x3.shape
    out_half = c // 2 if use_glu else c
    fold = _fold_factor(n, c, out_half)
    if not fold:
        raise ValueError(
            f"no admissible lane fold for shape {x3.shape}: need a "
            f"power-of-two fold with C*fold and out_C*fold multiples of "
            f"the 128-lane tile and N divisible by fold*{_CHUNKS} "
            f"(production dispatch guards this via _pallas_eligible)")
    n2, c2 = n // fold, c * fold
    out_c2 = out_half * fold
    chunks = _CHUNKS
    if fold > 1:
        x3 = x3.reshape(b, n2, c2)
        scale = jnp.tile(scale.reshape(1, c), (1, fold))
        bias = jnp.tile(bias.reshape(1, c), (1, fold))
    kernel = functools.partial(
        _kernel, n2=n2, c2=c2, true_c=c, groups=num_groups,
        cg=c // num_groups, fold=fold, chunks=chunks, eps=eps,
        use_glu=use_glu,
    )
    r = n2 // chunks
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, c2), lambda i: (0, 0)),
            pl.BlockSpec((1, c2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, n2, out_c2), x3.dtype),
        scratch_shapes=[
            pltpu.VMEM((n2, c2), x3.dtype),        # resident input slice
            pltpu.VMEM((2, r, out_c2), x3.dtype),  # output staging
            pltpu.SemaphoreType.DMA((chunks,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=INTERPRET,
    )(x3, scale.reshape(1, c2), bias.reshape(1, c2))
    return out.reshape(b, n, out_half)


def _pallas_eligible(x, num_groups: int, use_glu: bool) -> bool:
    """Dispatch to the kernel ONLY in its measured winning regime.

    v5e microbenchmarks (batch-16 generator shapes, bf16, device-loop):
    GLU cases LOSE ~2x to XLA's two-pass even with the selection-matmul
    epilogue (256x256x64 GLU: 2.76 ms vs 1.34; 128x128x192 GLU: 2.27 vs
    1.04), and fold=4 loses without GLU too (128x128x96: 0.83 vs 0.75).
    Wins are non-GLU with fold <= 2 and enough resident rows (128x128x128:
    1.23x; 64x64x64 fold=2: 1.06x). XLA overlaps its stat/apply passes far
    better than the single-read argument assumed — respect the data."""
    if use_glu or x.ndim != 4:
        return False
    b, h, w, c = x.shape
    n = h * w
    if n % _CHUNKS or c % num_groups:
        return False
    fold = _fold_factor(n, c, c)
    if not fold or fold > 2:
        return False
    n2, c2 = n // fold, c * fold
    if n2 % _CHUNKS or n2 < _MIN_ROWS:
        return False
    if n2 * c2 * x.dtype.itemsize > _VMEM_SLICE_BUDGET:
        return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm_kernel_op(x, scale, bias, num_groups, eps, use_glu):
    """Kernel-eligible shapes only. custom_vjp so autodiff never traces
    the Pallas call; see ``_gn_fwd``."""

    def tpu_path(x, scale, bias):
        b, h, w, c = x.shape
        out = _pallas_group_norm(x.reshape(b, h * w, c), scale, bias,
                                 num_groups, eps, use_glu)
        return out.reshape(b, h, w, -1)

    if INTERPRET:
        return tpu_path(x, scale, bias)
    return lax.platform_dependent(
        x, scale, bias,
        tpu=tpu_path,
        default=lambda x, s, b: group_norm_reference(
            x, s, b, num_groups, eps, use_glu),
    )


def group_norm_op(x, scale, bias, num_groups, eps, use_glu):
    """GroupNorm(+GLU): fused single-read Pallas kernel on TPU in its
    measured-win regime, flax-exact XLA reference elsewhere.

    Ineligible shapes call the reference DIRECTLY — plain autodiff, no
    custom_vjp wrapper — so training backward passes are the same fused
    XLA HLO as differentiating ``nn.GroupNorm`` (wrapping everything in a
    recompute-backward custom_vjp cost ~10% sustained train-step time)."""
    if not _pallas_eligible(x, num_groups, use_glu):
        return group_norm_reference(x, scale, bias, num_groups, eps, use_glu)
    return _group_norm_kernel_op(x, scale, bias, num_groups, eps, use_glu)


def _gn_fwd(x, scale, bias, num_groups, eps, use_glu):
    # custom_vjp routes here only under autodiff, i.e. in TRAINING steps:
    # use the XLA reference so the forward fuses with the surrounding
    # backward-pass HLO instead of paying the Pallas call (+ its recompute
    # backward). Primal-only calls — the sampling path, where the
    # bandwidth saving matters — never enter this function and keep the
    # fused kernel.
    return group_norm_reference(x, scale, bias, num_groups, eps, use_glu), (
        x, scale, bias)


def _gn_bwd(num_groups, eps, use_glu, res, g):
    # backward = VJP of the reference implementation (stats recompute); the
    # training step is dispatch-bound (BASELINE.md), sampling never takes it
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_reference(x_, s_, b_, num_groups, eps,
                                                use_glu),
        x, scale, bias,
    )
    return vjp(g)


_group_norm_kernel_op.defvjp(_gn_fwd, _gn_bwd)
