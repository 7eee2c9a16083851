"""ROI-align for the object-wise Fast R-CNN discriminator.

The reference vendors a CUDA ROI op for its object-wise discriminator
(SURVEY.md §2.4; paper §3.4 — the reference tree itself was unavailable).
On TPU we exploit that ROI boxes are axis-aligned, so bilinear ROI-align is
*separable*: for each (image, box) the output is

    out = A_y @ features @ A_x^T        (per channel)

where ``A_y (R, H)`` / ``A_x (R, W)`` are per-box interpolation-and-average
matrices folding the bilinear weights of all ``sampling_ratio`` sub-points of
each output bin. No gathers, no dynamic shapes — two batched matmuls the MXU
eats directly. Object count is statically padded to MAX_OBJECTS. NOTE:
padded (all-zero) boxes do NOT yield zero features — a degenerate box clamps
every sample to pixel (0, 0) with full weight, so padded slots return the
top-left pixel's features (tests/test_ops.py::test_zero_box_gives_top_left
pins this). Callers MUST mask by ``obj_valid`` (losses/gan_loss.py does);
never sum unmasked over the object axis.

Two implementations with identical semantics (torchvision ``roi_align`` with
``aligned=True``, verified by tests against the torch CPU oracle):

  * :func:`roi_align_xla`    — einsum formulation; differentiable by XLA AD;
    runs anywhere (CPU tests, interpret mode).
  * :func:`roi_align_pallas` — Pallas TPU kernel, grid over (batch, object),
    fp32 accumulation in VMEM, custom VJP whose backward is the transposed
    pair of matmuls.

Boxes are the framework-wide convention ``(x0, y0, w, h)`` normalized to
[0, 1]. Gradients flow to ``features`` only; boxes come from the layout
pipeline and are treated as constants (standard Fast R-CNN practice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_matrix(out_n: int, src_n: int, origin, extent, sampling_ratio: int):
    """Interpolation+average matrix A (..., out_n, src_n) for one axis.

    origin/extent: box start/size in *normalized* coords, any batch shape.
    Bin r averages ``sampling_ratio`` bilinear samples taken at
       src = origin*src_n + (r*q + k + 0.5) * extent*src_n / (out_n*q) - 0.5
    (torchvision ``aligned=True`` pixel-center convention). Samples outside
    [-1, src_n] contribute zero; inside ones clamp to [0, src_n - 1].
    """
    q = sampling_ratio
    fine_n = out_n * q
    dtype = jnp.float32
    origin = jnp.asarray(origin, dtype)
    extent = jnp.asarray(extent, dtype)
    # int32 iota then cast: Mosaic's tpu.iota only produces integers
    i = lax.broadcasted_iota(jnp.int32, (fine_n, src_n), 0).astype(dtype)
    s = lax.broadcasted_iota(jnp.int32, (fine_n, src_n), 1).astype(dtype)
    src = (
        origin[..., None, None] * src_n
        + (i + 0.5) * extent[..., None, None] * src_n / fine_n
        - 0.5
    )
    inside = ((src >= -1.0) & (src <= src_n)).astype(dtype)
    src_c = jnp.clip(src, 0.0, src_n - 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src_c - s)) * inside
    # fold the q-point average into the matrix: (..., out_n, q, src_n) -> mean
    return jnp.mean(
        w.reshape(*w.shape[:-2], out_n, q, src_n), axis=-2
    )  # (..., out_n, src_n)


# ---------------------------------------------------------------------------
# XLA formulation
# ---------------------------------------------------------------------------


def roi_align_xla(
    features: jnp.ndarray,  # (B, H, W, C) NHWC
    boxes: jnp.ndarray,  # (B, O, 4) normalized (x0, y0, w, h)
    out_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Separable ROI-align as two einsums. Returns (B, O, R, R, C)."""
    _, h, w, _ = features.shape
    boxes = lax.stop_gradient(boxes)
    a_y = _pool_matrix(out_size, h, boxes[..., 1], boxes[..., 3], sampling_ratio)
    a_x = _pool_matrix(out_size, w, boxes[..., 0], boxes[..., 2], sampling_ratio)
    f = features.astype(jnp.float32)
    # HIGHEST precision: on TPU the default einsum would use bf16 passes and
    # drift from the fp32-accumulating Pallas kernel
    t = jnp.einsum("boih,bhwc->boiwc", a_y, f,
                   precision=lax.Precision.HIGHEST)
    out = jnp.einsum("bojw,boiwc->boijc", a_x, t,
                     precision=lax.Precision.HIGHEST)
    return out.astype(features.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(box_ref, f_ref, out_ref, *, out_size, sampling_ratio, h, w, c,
                n_obj):
    idx = pl.program_id(0) * n_obj + pl.program_id(1)
    x0 = box_ref[idx, 0]
    y0 = box_ref[idx, 1]
    bw = box_ref[idx, 2]
    bh = box_ref[idx, 3]
    a_y = _pool_matrix(out_size, h, y0, bh, sampling_ratio)  # (R, H)
    a_x = _pool_matrix(out_size, w, x0, bw, sampling_ratio)  # (R, W)
    f = f_ref[0].astype(jnp.float32)  # (H, W, C)
    # HIGHEST precision: on real-TPU Mosaic the default runs fp32 operands
    # through bf16 MXU passes — interpret mode hides it, hardware showed a
    # 4e-3 fwd / 0.18 grad divergence vs roi_align_xla's HIGHEST einsums
    # (tools/roi_hw_check.py, round 3b). bf16 operands are exact either way.
    t = jax.lax.dot_general(  # (R, W, C): contract H
        a_y, f, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jax.lax.dot_general(  # (R, R, C): contract W of t with a_x
        a_x, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # -> (R_x, R_y, C)
    out_ref[0, 0] = jnp.swapaxes(out, 0, 1).astype(out_ref.dtype)


def _bwd_kernel(box_ref, g_ref, df_ref, *, out_size, sampling_ratio, h, w, c,
                n_obj):
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _():
        df_ref[0] = jnp.zeros_like(df_ref[0])

    idx = pl.program_id(0) * n_obj + o
    x0 = box_ref[idx, 0]
    y0 = box_ref[idx, 1]
    bw = box_ref[idx, 2]
    bh = box_ref[idx, 3]
    a_y = _pool_matrix(out_size, h, y0, bh, sampling_ratio)  # (R, H)
    a_x = _pool_matrix(out_size, w, x0, bw, sampling_ratio)  # (R, W)
    g = g_ref[0, 0].astype(jnp.float32)  # (R, R, C)
    # df[y, x, c] = sum_{i,j} a_y[i, y] a_x[j, x] g[i, j, c]
    # HIGHEST for the same hardware-only reason as the forward kernel.
    t = jax.lax.dot_general(  # (H, R_j, C): contract R_i
        a_y, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jax.lax.dot_general(  # (W, H, C): contract R_j of t
        a_x, t, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    df_ref[0] += jnp.swapaxes(d, 0, 1).astype(df_ref.dtype)


# Tests flip this to run the Pallas kernels in interpreter mode on CPU.
INTERPRET = False


def _pallas_fwd(features, boxes, out_size, sampling_ratio):
    b, h, w, c = features.shape
    o = boxes.shape[1]
    kernel = functools.partial(
        _fwd_kernel, out_size=out_size, sampling_ratio=sampling_ratio,
        h=h, w=w, c=c, n_obj=o,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # boxes ride in SMEM, whole
        grid=(b, o),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, j, boxes_ref: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, out_size, out_size, c),
            lambda i, j, boxes_ref: (i, j, 0, 0, 0),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, o, out_size, out_size, c), features.dtype),
        interpret=INTERPRET,
    )(boxes.reshape(b * o, 4).astype(jnp.float32), features)


def _pallas_bwd(boxes, out_size, sampling_ratio, f_shape, f_dtype, g):
    b, h, w, c = f_shape
    o = boxes.shape[1]
    kernel = functools.partial(
        _bwd_kernel, out_size=out_size, sampling_ratio=sampling_ratio,
        h=h, w=w, c=c, n_obj=o,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, o),
        in_specs=[
            pl.BlockSpec(
                (1, 1, out_size, out_size, c),
                lambda i, j, boxes_ref: (i, j, 0, 0, 0),
            ),
        ],
        # same output block revisited across the inner (object) grid dim:
        # accumulation pattern, initialized at o == 0
        out_specs=pl.BlockSpec((1, h, w, c), lambda i, j, boxes_ref: (i, 0, 0, 0)),
    )
    # Accumulate df in fp32 across the object grid steps (overlapping boxes
    # add into the same feature block; a bf16 running sum would round at
    # every add and diverge from roi_align_xla's fp32-summed backward) and
    # cast once to the cotangent dtype at the end.
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(f_shape, jnp.float32),
        interpret=INTERPRET,
    )(boxes.reshape(b * o, 4).astype(jnp.float32), g)
    return out.astype(f_dtype)


@functools.lru_cache(maxsize=None)
def _make_roi_fn(f_shape, f_dtype_name, out_size, sampling_ratio):
    """Build a custom-VJP ROI-align specialized to a static feature shape.

    Shape/dtype are closed over (not residuals) because custom_vjp residuals
    must be JAX types; one cached closure per distinct signature.
    """
    f_dtype = jnp.dtype(f_dtype_name)

    @jax.custom_vjp
    def fn(features, boxes):
        return _pallas_fwd(features, boxes, out_size, sampling_ratio)

    def fwd(features, boxes):
        return fn(features, boxes), boxes

    def bwd(boxes, g):
        df = _pallas_bwd(boxes, out_size, sampling_ratio, f_shape, f_dtype, g)
        return df, None

    fn.defvjp(fwd, bwd)
    return fn


def roi_align_pallas(features, boxes, out_size=7, sampling_ratio=2):
    """Pallas ROI-align. Same contract as :func:`roi_align_xla`."""
    fn = _make_roi_fn(features.shape, features.dtype.name, out_size, sampling_ratio)
    return fn(features, boxes)


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, XLA einsum elsewhere.

    Resolved at *lowering* time via ``lax.platform_dependent`` so the same
    traced program works whether it lands on TPU or CPU (e.g. CPU-side param
    init while the default backend is TPU). The kernel's (R, R, C) block
    stores fold minor dims into lanes, so Mosaic requires C to be a
    multiple of 128 (sub-128 C is a hard "unsupported shape cast" compile
    error — hit by tiny test dims, C=32); ineligible shapes take the XLA
    einsum on every platform. Production ObjectDNet widths (DF_DIM*4 =
    256) stay on the kernel."""
    if INTERPRET:
        return roi_align_pallas(features, boxes, out_size, sampling_ratio)
    if features.shape[-1] % 128 != 0:
        return roi_align_xla(features, boxes, out_size, sampling_ratio)
    return jax.lax.platform_dependent(
        features,
        boxes,
        tpu=lambda f, b: roi_align_pallas(f, b, out_size, sampling_ratio),
        default=lambda f, b: roi_align_xla(f, b, out_size, sampling_ratio),
    )
