"""VGG-16 architecture + torchvision-layout converter tests (Stage-B
perceptual loss, SURVEY.md §2.2 / paper §3.2). torchvision itself is not
installed; the tests build a lineage-shaped torch replica (same Sequential
indices, so the state dict keys match torchvision's exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objgan_tpu.models.vgg import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    VGG16,
    load_torchvision_vgg16,
    torch_name_map,
    vgg_perceptual_loss,
)


def _torch_vgg16():
    """torchvision-vgg16-shaped torch module (same state_dict keys)."""
    import torch.nn as tnn

    cfgs = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfgs:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.ReLU(True)]
            in_ch = v

    class _VGG(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*layers)
            self.classifier = tnn.Sequential(
                tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True),
                tnn.Dropout(), tnn.Linear(4096, 4096), tnn.ReLU(True),
                tnn.Dropout(), tnn.Linear(4096, 1000),
            )

        def forward(self, x):
            x = self.features(x)
            return self.classifier(x.flatten(1))

    return _VGG()


@pytest.fixture(scope="module")
def torch_model():
    import torch

    torch.manual_seed(0)
    m = _torch_vgg16()
    m.eval()
    return m


def _normalize_torch(x01):
    import torch

    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    return (x01 - mean) / std


class TestGraphEquivalence:
    def test_feature_taps_match_torch(self, torch_model):
        """relu1_2..relu4_3 features bit-near torch on a 64px input."""
        import torch

        x = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(
            np.float32)
        model = VGG16(stop_at="relu4_3")
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = load_torchvision_vgg16(params, torch_model.state_dict())
        taps = model.apply(params, jnp.asarray(x))

        with torch.no_grad():
            t = _normalize_torch(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))
            feats = {}
            for i, layer in enumerate(torch_model.features):
                t = layer(t)
                if i in (3, 8, 15, 22):  # ReLU after convs 2/7/14/23
                    feats[{3: "relu1_2", 8: "relu2_2", 15: "relu3_3",
                           22: "relu4_3"}[i]] = t.numpy()
        for name in ("relu1_2", "relu2_2", "relu3_3", "relu4_3"):
            ours = np.asarray(taps[name]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(ours, feats[name], atol=1e-4)

    def test_classifier_matches_torch_at_224(self, torch_model):
        """The flatten-order permutation for classifier.0 is exact."""
        import torch

        x = np.random.default_rng(1).uniform(0, 1, (1, 224, 224, 3)).astype(
            np.float32)
        model = VGG16(with_classifier=True)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = load_torchvision_vgg16(params, torch_model.state_dict())
        ours = np.asarray(model.apply(params, jnp.asarray(x))["logits"])
        with torch.no_grad():
            theirs = torch_model(_normalize_torch(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-3)

    def test_name_map_inventory(self, torch_model):
        sd = torch_model.state_dict()
        m = torch_name_map(list(sd))
        assert set(m) == set(sd)
        assert m["features.0.weight"] == "features_0/kernel"
        assert m["classifier.6.bias"] == "classifier_6/bias"


class TestPerceptualLoss:
    def test_zero_for_identical_positive_for_different(self):
        model = VGG16(stop_at="relu4_3")
        x = jnp.asarray(np.random.default_rng(2).uniform(
            0, 1, (3, 16, 16)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 3)))
        same = vgg_perceptual_loss(model, params, x, x)
        assert same.shape == (3,)
        np.testing.assert_allclose(np.asarray(same), 0.0, atol=1e-6)
        other = vgg_perceptual_loss(model, params, x, 1.0 - x)
        assert float(np.asarray(other).min()) > 0.0

    def test_shape_trainer_vgg_mode_step(self, tiny_cfg, rng):
        """One Stage-B train step with SHAPE.PERCEPTUAL=vgg is finite and
        reports the perceptual metric."""
        from objgan_tpu.data.synthetic import synthetic_batch
        from objgan_tpu.train.shape import ShapeTrainer

        cfg = tiny_cfg.replace(DTYPE="float32").merged(
            {"SHAPE": {"PERCEPTUAL": "vgg"}})
        batch = synthetic_batch(cfg, rng, 2, with_images=False)
        tr = ShapeTrainer(cfg)
        state = tr.init_state(rng, batch)
        state, aux = jax.jit(tr.train_step)(state, batch, rng)
        assert "shape_perceptual" in aux
        for k, v in aux.items():
            assert np.isfinite(float(v)), k
