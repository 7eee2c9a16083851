"""Golden-numerics fixtures (SURVEY.md §4 tier 2): deterministic inputs ->
checked-in fp32 outputs for the attention/GMM/rasterize core, proving the
numerics stay put across refactors ("bitwise-comparable attention maps at
fp32" — BASELINE.json). Regenerate with ``python tests/golden_utils.py``
only when a numerics change is *intended*."""

import os

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.npz")


def compute_goldens():
    import jax
    import jax.numpy as jnp

    from objgan_tpu.ops import attention, gmm, rasterize

    k = jax.random.PRNGKey(1234)
    ks = jax.random.split(k, 8)
    out = {}

    q = jax.random.normal(ks[0], (2, 12, 16))
    s = jax.random.normal(ks[1], (2, 7, 16))
    mask = jnp.array([[False] * 5 + [True] * 2, [False] * 7])
    ctx, attn = attention.grid_attention(q, s, mask)
    out["grid_ctx"] = np.asarray(ctx)
    out["grid_attn"] = np.asarray(attn)

    w, dattn = attention.damsm_attention(q, s, 4.0)
    out["damsm_w"] = np.asarray(w)
    out["damsm_attn"] = np.asarray(dattn)

    oq = jax.random.normal(ks[2], (2, 4, 16))
    valid = jnp.array([[1.0, 1.0, 1.0, 0.0], [1.0, 1.0, 0.0, 0.0]])
    octx, oattn = attention.object_attention(oq, s, mask, valid)
    out["obj_ctx"] = np.asarray(octx)
    out["obj_attn"] = np.asarray(oattn)

    params = jax.random.normal(ks[3], (5, gmm.param_size(4)))
    boxes = jax.random.uniform(ks[4], (5, 4))
    out["gmm_logprob"] = np.asarray(gmm.log_prob(params, boxes, 4))

    masks = jax.random.uniform(ks[5], (1, 3, 8, 8))
    bx = jnp.array([[[0.1, 0.2, 0.5, 0.6], [0.0, 0.0, 1.0, 1.0],
                     [0.4, 0.4, 0.2, 0.3]]])
    out["paste"] = np.asarray(rasterize.paste_masks(masks, bx, 16, 16))
    out["box_maps"] = np.asarray(rasterize.box_maps(bx, 16, 16))
    return out


if __name__ == "__main__":
    import os

    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")
    np.savez(GOLDEN_PATH, **compute_goldens())
    print(f"wrote {GOLDEN_PATH}")
