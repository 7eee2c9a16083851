"""Streaming batch inference over the composed pipeline (serve.py backend).

The reference has no serving story — its three stages are separate scripts
with files on disk between them (SURVEY.md §1). This front-end turns the
fused caption->image program (objgan_tpu/pipeline_e2e.py) into a
production-shaped request loop, built around the TPU execution model:

* ONE compiled program for the whole serve lifetime: requests are packed
  into a fixed batch of ``batch_size`` and the ragged tail is padded by
  repeating the last caption (padded rows are dropped on output). A
  variable batch dimension would retrace per distinct size — 3-8 min per
  compile through this image's remote-compile tunnel (CLAUDE.md).
* One-deep software pipeline: jax dispatch is asynchronous, so batch k's
  host work (PNG encode, JSON emit) and batch k+1's tokenization run on
  the host WHILE the device executes — the device never waits on request
  parsing, mirroring the trainers' _PrefetchFeed overlap (cli.py).
* Per-batch rng folding keeps results reproducible for a fixed request
  order and RNG_SEED while still varying samples across batches.

Request format (one per line): either a JSON object
``{"id": ..., "caption": "..."}`` or a bare caption string (id = running
line number). Responses are emitted as one JSON object per request with
the generated layout and the written image path.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np


def parse_requests(lines: Iterable[str]) -> Iterator[Dict]:
    """Lazily parse a line stream into request dicts.

    JSON lines must carry a ``caption``; anything that does not parse as a
    JSON object is treated as a bare caption. Blank lines are skipped.
    """
    for n, ln in enumerate(lines):
        ln = ln.strip()
        if not ln:
            continue
        req: Optional[Dict] = None
        if ln.startswith("{"):
            try:
                obj = json.loads(ln)
            except json.JSONDecodeError:
                obj = None
            if isinstance(obj, dict):
                if "caption" not in obj:
                    raise ValueError(
                        f"request line {n} is a JSON object without a "
                        f"'caption' key: {ln[:80]!r}")
                req = {"id": obj.get("id", n), "caption": str(obj["caption"])}
        if req is None:
            req = {"id": n, "caption": ln}
        yield req


def _batched(it: Iterator[Dict], n: int) -> Iterator[List[Dict]]:
    group: List[Dict] = []
    for item in it:
        group.append(item)
        if len(group) == n:
            yield group
            group = []
    if group:
        yield group


def run_serve(
    cfg,
    vocab,
    requests: Iterable[Dict],
    out_dir: str,
    batch_size: Optional[int] = None,
    emit: Optional[Callable[[Dict], None]] = None,
    output_dir: Optional[str] = None,
    save_images: bool = True,
) -> Dict:
    """Drive the composed pipeline over a request stream; returns stats.

    ``emit`` receives one response dict per request, in request order:
    ``{"id", "caption", "objects": [[label, [x,y,w,h]], ...], "image"}``.
    ``output_dir`` overrides where stage checkpoints are restored from
    (default ``cfg.OUTPUT_DIR`` — see ObjGanPipeline.load_states).
    """
    import jax

    from objgan_tpu.data.synthetic import synthetic_batch
    from objgan_tpu.pipeline_e2e import ObjGanPipeline
    from objgan_tpu.utils.visualize import _to_uint8, save_png

    b = int(batch_size or cfg.TRAIN.BATCH_SIZE)
    if b < 1:
        raise ValueError(f"batch_size must be >= 1, got {b}")
    if len(vocab) > cfg.TEXT.VOCAB_SIZE:
        raise ValueError(
            f"vocabulary has {len(vocab)} words but cfg.TEXT.VOCAB_SIZE is "
            f"{cfg.TEXT.VOCAB_SIZE} (nn.Embed would silently clamp ids)")
    os.makedirs(out_dir, exist_ok=True)

    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    pipe = ObjGanPipeline(cfg)
    states = pipe.load_states(rng, synthetic_batch(cfg, rng, b),
                              output_dir=output_dir)
    gen = pipe.jitted_generate()

    def encode(group: List[Dict]):
        caps = [r["caption"] for r in group]
        # pad the ragged tail by repeating the last caption: the program
        # shape stays (b, T) so the one compiled executable serves every
        # batch; padded rows are simply not emitted below
        caps = caps + [caps[-1]] * (b - len(caps))
        ids, lens = vocab.encode_batch(caps, cfg.TEXT.WORDS_NUM)
        return np.asarray(ids), np.asarray(lens)

    def flush(group: List[Dict], out, t_dispatch: float) -> float:
        # device_get blocks until the batch is done; everything after is
        # host-side and overlaps the NEXT batch's device execution
        imgs = np.asarray(out["images"][-1][: len(group)])
        labels = np.asarray(out["labels"][: len(group)])
        boxes = np.asarray(out["boxes"][: len(group)])
        valid = np.asarray(out["obj_valid"][: len(group)])
        done = time.monotonic()
        for i, req in enumerate(group):
            path = None
            if save_images:
                path = os.path.join(out_dir, f"serve_{req['id']}.png")
                save_png(path, _to_uint8(imgs[i]))
            resp = {
                "id": req["id"],
                "caption": req["caption"],
                "objects": [
                    [int(l), [round(float(x), 4) for x in bx]]
                    for l, bx, v in zip(labels[i], boxes[i], valid[i]) if v
                ],
                "image": path,
            }
            if emit is not None:
                emit(resp)
        return done - t_dispatch

    n_req = n_batch = 0
    device_wall = 0.0
    t0 = time.monotonic()
    pending = None  # (group, device handles, dispatch time)
    for group in _batched(iter(requests), b):
        ids, lens = encode(group)
        t_d = time.monotonic()
        out = gen(states, ids, lens, jax.random.fold_in(rng, n_batch))
        n_batch += 1
        n_req += len(group)
        if pending is not None:
            device_wall += flush(*pending)
        pending = (group, out, t_d)
    if pending is not None:
        device_wall += flush(*pending)
    wall = time.monotonic() - t0

    return {
        "requests": n_req,
        "batches": n_batch,
        "batch_size": b,
        "wall_s": round(wall, 4),
        # wall from each batch's dispatch to its fetch completing — an
        # upper bound on device time (includes the first compile)
        "device_wall_s": round(device_wall, 4),
        "req_per_s": round(n_req / max(wall, 1e-9), 3),
    }
