"""Device-side layout rasterization: boxes -> spatial maps, object masks ->
canvas pastes.

The reference rasterizes boxes/masks on the host inside its PyTorch datasets
(SURVEY.md §2.2/§2.3 "Dataset"). Here rasterization is also available
on-device as pure XLA so the generator can re-rasterize at every pyramid
scale (64/128/256) without host round-trips.

Box convention throughout the framework: ``(x0, y0, w, h)`` normalized to
[0, 1], top-left origin — COCO annotation format divided by image size.

The mask paste exploits that box placement is an axis-aligned scale+translate,
so bilinear resampling is *separable*: build per-axis interpolation matrices
and apply them as two batched matmuls (MXU work) instead of per-pixel gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _pixel_centers(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized coordinates of pixel centers: (i + 0.5) / n, shape (n, 1)."""
    return (lax.broadcasted_iota(dtype, (n, 1), 0) + 0.5) / n


def box_maps(boxes: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Rasterize boxes (B, O, 4) -> hard interior maps (B, O, H, W) in [0,1].

    A pixel is inside iff its center lies in [x0, x0+w) x [y0, y0+h).
    """
    x0, y0, w, h = (boxes[..., i] for i in range(4))  # each (B, O)
    ys = _pixel_centers(height, boxes.dtype)[:, 0]  # (H,)
    xs = _pixel_centers(width, boxes.dtype)[:, 0]  # (W,)
    in_y = (ys[None, None, :] >= y0[..., None]) & (
        ys[None, None, :] < (y0 + h)[..., None]
    )  # (B, O, H)
    in_x = (xs[None, None, :] >= x0[..., None]) & (
        xs[None, None, :] < (x0 + w)[..., None]
    )  # (B, O, W)
    return (
        in_y[..., :, None].astype(boxes.dtype) * in_x[..., None, :].astype(boxes.dtype)
    )


def _interp_matrix(out_n: int, src_n: int, origin, extent) -> jnp.ndarray:
    """Bilinear sampling matrix R (..., out_n, src_n):

    out[i] = sum_s R[i, s] * src[s], where output pixel i's center maps to
    source coordinate ((i+.5)/out_n - origin) / extent * src_n - 0.5.
    Rows mapping outside the box are all-zero (zero padding semantics).
    """
    dtype = jnp.result_type(origin, jnp.float32)
    out_c = _pixel_centers(out_n, dtype)[:, 0]  # (out_n,)
    # src coordinate of each output pixel: (..., out_n)
    src = (out_c - origin[..., None]) / jnp.maximum(extent[..., None], 1e-6)
    src = src * src_n - 0.5
    s_idx = lax.broadcasted_iota(dtype, (out_n, src_n), 1)  # (out_n, src_n)
    weight = jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - s_idx))
    # zero out rows outside [0, 1) in normalized box space
    inside = ((src >= -0.5) & (src <= src_n - 0.5)).astype(dtype)
    return weight * inside[..., None]


def paste_masks(
    masks: jnp.ndarray,  # (B, O, S, S) per-object masks in their own box frame
    boxes: jnp.ndarray,  # (B, O, 4) normalized (x0, y0, w, h)
    height: int,
    width: int,
) -> jnp.ndarray:
    """Paste each object's SxS mask into its box on an HxW canvas with
    separable bilinear resampling. Returns (B, O, H, W).

    out = R_y @ mask @ R_x^T — two batched matmuls, no gathers.
    """
    s = masks.shape[-1]
    x0, y0, w, h = (boxes[..., i].astype(jnp.float32) for i in range(4))
    r_y = _interp_matrix(height, s, y0, h)  # (B, O, H, S)
    r_x = _interp_matrix(width, s, x0, w)  # (B, O, W, S)
    m = masks.astype(jnp.float32)
    # default matmul precision on purpose: these produce soft paste weights
    # (bf16-level error is invisible downstream) and the fp32-exactness
    # invariant covers attention maps, not rasterization; HIGHEST here cost
    # ~15% of the full train step on v5e. CPU goldens remain bitwise (CPU
    # matmuls are fp32 regardless).
    tmp = jnp.einsum("bohs,bosp->bohp", r_y, m)  # rows resampled
    out = jnp.einsum("bohp,bowp->bohw", tmp, r_x)  # cols resampled
    return out.astype(masks.dtype)


def layout_map(
    obj_maps: jnp.ndarray,  # (B, O, H, W) box or shape maps
    valid: jnp.ndarray,  # (B, O)
) -> jnp.ndarray:
    """Collapse per-object maps to a single-channel occupancy canvas (B,H,W,1)."""
    v = valid.astype(obj_maps.dtype)[..., None, None]
    canvas = jnp.max(obj_maps * v, axis=1)
    return canvas[..., None]
