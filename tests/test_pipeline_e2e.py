"""Composed caption->image pipeline test (one jitted program, all stages)."""

import jax
import jax.numpy as jnp

from objgan_tpu.data.synthetic import synthetic_batch
from objgan_tpu.pipeline_e2e import ObjGanPipeline


def test_end_to_end_generate(tiny_cfg):
    cfg = tiny_cfg.replace(DTYPE="float32")
    pipe = ObjGanPipeline(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng)
    states = pipe.init_states(rng, batch)
    gen = pipe.jitted_generate()
    out = gen(states, batch["captions"], batch["cap_lens"], rng)
    b = batch["captions"].shape[0]
    o = cfg.OBJ.MAX_OBJECTS
    s = cfg.OBJ.SHAPE_SIZE
    assert out["labels"].shape == (b, o)
    assert out["boxes"].shape == (b, o, 4)
    assert out["masks"].shape == (b, o, s, s)
    for img, size in zip(out["images"], cfg.branch_sizes):
        assert img.shape == (b, size, size, 3)
        assert bool(jnp.all(jnp.isfinite(img)))
    # generated boxes in range, masks in [0,1]
    assert float(out["boxes"].min()) >= 0.0
    assert float(out["boxes"].max()) <= 1.0
    assert float(out["masks"].min()) >= 0.0
    assert float(out["masks"].max()) <= 1.0
