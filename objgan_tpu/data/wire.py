"""Compact host->device batch wire format (VERDICT r2 "next" #1).

The full-precision batch pytree ships 19 MB per batch-16 (float32 image
pyramid at 3 scales + float32 masks) through this container's ~1 GB/s
host->device relay, and building the pyramid costs 3 PIL resizes per record
on a single-core host. Neither is necessary on TPU:

  * images cross the wire once, uint8, finest scale only (5x fewer bytes);
  * the 64/128 scales are exact 2x2 box-filter means of the finest scale —
    a reshape-mean the device does in microseconds inside the train step;
  * binary masks cross as uint8.

``from_wire`` is jit-traceable and runs at the top of every trainer step,
a no-op for classic batches — trainers accept either format. DIVERGENCE
(documented per the design invariants): the lineage resizes each pyramid
scale independently from the decoded original; here coarse scales derive
from the finest by exact integer-factor mean pooling. For originals already
at the finest size the two are bit-identical (tests/test_wire.py); for
larger originals the difference is the usual area-resample associativity
residue (<1 ULP-scale per 8-bit pixel).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

WIRE_IMAGE = "image_u8"    # (B, S, S, 3) uint8 finest scale
WIRE_SHAPES = "shapes_u8"  # (B, O, s, s) uint8, mask value quantized x255


def is_wire(batch: Dict) -> bool:
    return WIRE_IMAGE in batch or WIRE_SHAPES in batch


def from_wire(cfg, batch: Dict) -> Dict:
    """Expand a wire batch to the classic pytree (images pyramid list in
    [-1, 1] float, float masks). Traced inside jitted train steps so the
    expansion fuses with the consumers; identity for classic batches."""
    if not is_wire(batch):
        return batch
    out = {k: v for k, v in batch.items()
           if k not in (WIRE_IMAGE, WIRE_SHAPES)}
    if WIRE_SHAPES in batch:
        # masks ride the wire 255-quantized so soft/fractional values
        # (area-resized boundaries) survive within 1/510 instead of being
        # binarized; binary masks round-trip exactly (255/255 == 1.0)
        out["shapes"] = batch[WIRE_SHAPES].astype(jnp.float32) / 255.0
    if WIRE_IMAGE in batch:
        img = batch[WIRE_IMAGE].astype(jnp.float32) / 127.5 - 1.0
        sizes = list(cfg.branch_sizes)          # coarse -> fine
        if img.shape[1] != sizes[-1]:  # shapes are static: checked at trace
            raise ValueError(
                f"wire image is {img.shape[1]}px but cfg expects finest "
                f"scale {sizes[-1]}px ({sizes}) — feed and config disagree")
        pyr = [img]
        for sz in reversed(sizes[:-1]):
            prev = pyr[0]
            f = prev.shape[1] // sz
            b, h, w, c = prev.shape
            pyr.insert(0, prev.reshape(b, sz, f, sz, f, c).mean((2, 4)))
        out["images"] = pyr
    return out
