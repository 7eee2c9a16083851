"""Inception-v3 architecture + torchvision converter round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objgan_tpu.models.inception_v3 import (
    InceptionV3,
    load_torchvision_checkpoint,
    torch_name_map,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_feature_shapes(model_and_params):
    model, params = model_and_params
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 299, 299, 3),
                           minval=-1, maxval=1)
    out = model.apply(params, x)
    assert out["mixed_6e"].shape == (2, 17, 17, 768)
    assert out["pool"].shape == (2, 2048)
    assert out["logits"].shape == (2, 1000)
    assert bool(jnp.all(jnp.isfinite(out["logits"])))


def test_resize_path(model_and_params):
    model, params = model_and_params
    x = jnp.zeros((1, 256, 256, 3))
    out = model.apply(params, x)
    assert out["pool"].shape == (1, 2048)


def _fake_torch_state_dict(params):
    """Invert the flax tree into a torchvision-shaped state_dict (random
    values preserved), exercising the exact name/layout mapping."""
    import torch

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sd = {}
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        keys = [k for k in keys if k != "params"]
        arr = np.asarray(leaf)
        leafname = keys[-1]
        scope = keys[:-1]
        if leafname == "kernel" and arr.ndim == 4:
            sd[".".join(scope) + ".weight"] = torch.from_numpy(
                arr.transpose(3, 2, 0, 1).copy()
            )
        elif leafname == "kernel":
            sd[".".join(scope) + ".weight"] = torch.from_numpy(arr.T.copy())
        elif leafname == "bias":
            sd[".".join(scope) + ".bias"] = torch.from_numpy(arr.copy())
        elif leafname.startswith("bn_"):
            tleaf = {
                "bn_scale": "bn.weight", "bn_bias": "bn.bias",
                "bn_mean": "bn.running_mean", "bn_var": "bn.running_var",
            }[leafname]
            sd[".".join(scope) + "." + tleaf] = torch.from_numpy(arr.copy())
        else:
            raise AssertionError(leafname)
    return sd


def test_torchvision_roundtrip(model_and_params):
    model, params = model_and_params
    sd = _fake_torch_state_dict(params)
    # torchvision inception has 94 convs + fc: sanity-check the inventory
    n_convs = sum(1 for k in sd if k.endswith(".weight") and sd[k].dim() == 4)
    assert n_convs == 94
    # load into a DIFFERENT init; outputs must then match the original
    other = model.init(jax.random.PRNGKey(42), jnp.zeros((1, 299, 299, 3)))
    restored = load_torchvision_checkpoint(other, sd)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 299, 299, 3),
                           minval=-1, maxval=1)
    a = model.apply(params, x)
    b = model.apply(restored, x)
    np.testing.assert_allclose(
        np.asarray(a["logits"]), np.asarray(b["logits"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["pool"]), np.asarray(b["pool"]), atol=1e-5
    )


def test_name_map_skips_aux():
    m = torch_name_map([
        "AuxLogits.conv0.conv.weight",
        "Mixed_5b.branch1x1.conv.weight",
        "Mixed_5b.branch1x1.bn.running_var",
        "Mixed_5b.branch1x1.bn.num_batches_tracked",
        "fc.weight",
    ])
    assert "AuxLogits.conv0.conv.weight" not in m
    assert m["Mixed_5b.branch1x1.conv.weight"] == (
        "Mixed_5b/branch1x1/conv/kernel")
    assert m["Mixed_5b.branch1x1.bn.running_var"] == (
        "Mixed_5b/branch1x1/bn_var")
    assert m["fc.weight"] == "fc/kernel"
