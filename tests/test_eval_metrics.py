"""Sanity tests for the FID / IS / R-precision implementations."""

import numpy as np

from objgan_tpu.utils.eval_metrics import (
    frechet_distance,
    inception_score,
    r_precision,
)


def test_fid_zero_for_identical_sets():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 16))
    assert frechet_distance(a, a.copy()) < 1e-6


def test_fid_grows_with_mean_shift():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 8))
    near = rng.normal(size=(500, 8)) + 0.1
    far = rng.normal(size=(500, 8)) + 3.0
    assert frechet_distance(a, near) < frechet_distance(a, far)
    # analytic check: same cov, mean shift d -> FID ~ d^2 * dim
    shift = a + 2.0
    fid = frechet_distance(a, shift)
    assert abs(fid - 4.0 * 8) < 2.0


def test_inception_score_bounds():
    n, c = 200, 10
    uniform = np.full((n, c), 1.0 / c)
    is_u, _ = inception_score(uniform, splits=2)
    assert abs(is_u - 1.0) < 1e-6  # uniform conditionals -> IS 1
    onehot = np.eye(c)[np.arange(n) % c]
    is_o, _ = inception_score(onehot, splits=2)
    assert is_o > c - 1  # confident + diverse -> IS ~ C


def test_r_precision_perfect_and_random():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(50, 16))
    assert r_precision(feats, feats, n_mismatched=20) == 1.0
    other = rng.normal(size=(50, 16))
    assert r_precision(other, feats, n_mismatched=20) < 0.5


def test_strict_eval_refuses_without_weights():
    """gan/eval.py --strict with no --inception_pth must exit non-zero
    before computing anything (random-Inception FID looks real but is
    meaningless — VERDICT r2 weak #7)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "gan", "eval.py"), "--strict"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 2
    assert "inception_pth" in r.stderr


def test_unique_epoch_images_truncates_epoch_straddle():
    """Real-side FID stats must see every unique image exactly once even
    when BATCH_SIZE does not divide the dataset: feeds straddle the epoch
    boundary, so the trailing batch carries epoch-2 duplicates that must be
    truncated (round-3 review finding)."""
    from objgan_tpu.utils.fid_runner import unique_epoch_images

    class FakeFeed:
        """5 records, batch 2 -> batches straddle: [0,1],[2,3],[4,0'],..."""

        def __iter__(self):
            order = [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
            for i in range(0, len(order), 2):
                ids = order[i:i + 2]
                yield {"images": [np.asarray(ids, np.float32)
                                  .reshape(-1, 1, 1, 1)
                                  * np.ones((1, 4, 4, 3), np.float32)]}

    got = list(unique_epoch_images(FakeFeed(), 5))
    ids = np.concatenate([b[:, 0, 0, 0] for b in got])
    assert sorted(ids.tolist()) == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert sum(b.shape[0] for b in got) == 5


def test_frechet_from_stats_matches_direct():
    """The cached-real-side decomposition (activation_stats +
    frechet_from_stats) must equal the direct two-set FID exactly — the
    eval loop swaps between them depending on cache state."""
    from objgan_tpu.utils.eval_metrics import (
        activation_stats, frechet_distance, frechet_from_stats,
    )

    rng = np.random.default_rng(3)
    a = rng.normal(size=(200, 16))
    b = rng.normal(loc=0.3, size=(180, 16))
    direct = frechet_distance(a, b)
    via_stats = frechet_from_stats(*activation_stats(a),
                                   *activation_stats(b))
    np.testing.assert_allclose(via_stats, direct, rtol=1e-12)


def test_real_stats_cache_key_sensitivity(tmp_path):
    """The cache path must move whenever the feature space (backbone, dims)
    or the data (manifest contents) can have changed, and stay put
    otherwise (same curve reuses one file)."""
    import os
    import time

    from objgan_tpu.core.config import tiny_test_config
    from objgan_tpu.utils.fid_runner import real_stats_cache_path

    cfg = tiny_test_config()
    m = tmp_path / "manifest.json"
    m.write_text("[]")

    base = real_stats_cache_path(cfg, str(m), 10, "lite")
    assert base == real_stats_cache_path(cfg, str(m), 10, "lite")
    assert os.path.dirname(base) == str(tmp_path)

    # different backbone => different feature space => different key
    cfg2 = cfg.merged({"TEXT": {"CNN_BACKBONE": "inception"}})
    assert real_stats_cache_path(cfg2, str(m), 10, "lite") != base
    # regenerated dataset (same path/count, new contents) => new key
    time.sleep(0.01)
    m.write_text("[ ]")
    assert real_stats_cache_path(cfg, str(m), 10, "lite") != base
    # strict weights file participates via path + fingerprint
    w = tmp_path / "weights.pth"
    w.write_bytes(b"x")
    k1 = real_stats_cache_path(cfg, str(m), 10, "strict", str(w))
    w.write_bytes(b"xy")
    assert real_stats_cache_path(cfg, str(m), 10, "strict", str(w)) != k1

    # image payloads: records' image_file contents are fingerprinted too —
    # regenerating images IN PLACE (manifest untouched) must move the key
    img = tmp_path / "img0.png"
    img.write_bytes(b"aaaa")
    recs = [{"image_file": "img0.png"}]
    ki = real_stats_cache_path(cfg, str(m), 10, "lite", records=recs,
                               image_root=str(tmp_path))
    assert ki == real_stats_cache_path(cfg, str(m), 10, "lite", records=recs,
                                       image_root=str(tmp_path))
    time.sleep(0.01)
    img.write_bytes(b"bbbb")  # same size, new mtime
    assert real_stats_cache_path(cfg, str(m), 10, "lite", records=recs,
                                 image_root=str(tmp_path)) != ki


def test_save_stats_atomic_roundtrip_and_no_tmp_left(tmp_path):
    import numpy as np

    from objgan_tpu.utils.fid_runner import save_stats_atomic

    path = str(tmp_path / ".fid_real_stats_abc.npz")
    mu, cov = np.arange(4.0), np.eye(4)
    save_stats_atomic(path, mu, cov)
    z = np.load(path)
    np.testing.assert_array_equal(z["mu"], mu)
    np.testing.assert_array_equal(z["cov"], cov)
    leftovers = [f for f in tmp_path.iterdir() if ".tmp" in f.name]
    assert not leftovers


def test_class_probe_learns_separable_classes_and_is_discriminates():
    """The lite-IS probe (VERDICT r3 next #4): on linearly separable
    synthetic features it must classify well, and the IS it induces must
    actually rank a class-faithful 'generator' above a collapsed one —
    the property the old constant feature-softmax surrogate lacked."""
    from objgan_tpu.utils.eval_metrics import (
        fit_class_probe, inception_score, probe_probs,
    )

    rng = np.random.default_rng(0)
    n_cls, d, per = 8, 32, 60
    centers = rng.normal(scale=4.0, size=(n_cls, d))
    feats = np.concatenate([centers[c] + rng.normal(size=(per, d))
                            for c in range(n_cls)])
    labels = np.repeat(np.arange(n_cls), per)
    perm = rng.permutation(len(labels))
    probe = fit_class_probe(feats[perm], labels[perm], n_cls)
    assert probe["train_acc"] > 0.95
    assert probe["holdout_acc"] > 0.9

    probs = probe_probs(probe, feats)
    assert probs.shape == (len(labels), n_cls)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-9)

    # 'good generator': samples near every class center -> sharp p(y|x),
    # uniform marginal -> IS near n_cls. 'collapsed generator': all samples
    # near one center -> IS near 1. The probe-IS must separate them.
    # (shuffled: inception_score's splits assume exchangeable order, and a
    # class-blocked order concentrates each split's marginal)
    good = probe_probs(probe, feats[perm])
    collapsed = probe_probs(
        probe, centers[3] + rng.normal(size=(len(labels), d)))
    is_good, _ = inception_score(good, splits=4)
    is_bad, _ = inception_score(collapsed, splits=4)
    assert is_good > 3.0 > 1.5 > is_bad


def test_class_probe_validates_inputs():
    import pytest

    from objgan_tpu.utils.eval_metrics import fit_class_probe

    with pytest.raises(ValueError, match="mismatch"):
        fit_class_probe(np.zeros((4, 2)), np.zeros(3), 5)
    with pytest.raises(ValueError, match="outside"):
        fit_class_probe(np.zeros((4, 2)), np.array([0, 1, 5, 2]), 5)
    with pytest.raises(ValueError, match="too few"):
        fit_class_probe(np.zeros((1, 2)), np.zeros(1), 5)


def test_primary_labels_picks_largest_valid_object():
    from objgan_tpu.utils.fid_runner import primary_labels

    batch = {
        # image 0: obj 1 (label 7) is largest valid; the even-larger obj 2
        # is padding and must be ignored. image 1: zero valid -> label 0.
        "labels": np.array([[3, 7, 9], [5, 6, 2]], np.int32),
        "boxes": np.array([
            [[0, 0, 0.2, 0.2], [0, 0, 0.5, 0.5], [0, 0, 0.9, 0.9]],
            [[0, 0, 0.8, 0.8], [0, 0, 0.1, 0.1], [0, 0, 0.2, 0.2]],
        ], np.float32),
        "obj_valid": np.array([[1, 1, 0], [0, 0, 0]], np.float32),
    }
    np.testing.assert_array_equal(primary_labels(batch),
                                  np.array([7, 0], np.int32))


def test_unique_epoch_batches_pairs_images_with_labels():
    from objgan_tpu.utils.fid_runner import unique_epoch_batches

    class FakeFeed:
        def __iter__(self):
            for ids in ([0, 1], [2, 0]):  # 3 records, batch 2: straddles
                b = len(ids)
                yield {
                    "images": [np.asarray(ids, np.float32)
                               .reshape(-1, 1, 1, 1)
                               * np.ones((1, 4, 4, 3), np.float32)],
                    "labels": np.asarray(ids, np.int32)[:, None] + 10,
                    "boxes": np.full((b, 1, 4), 0.5, np.float32),
                    "obj_valid": np.ones((b, 1), np.float32),
                }

    got = list(unique_epoch_batches(FakeFeed(), 3))
    ids = np.concatenate([img[:, 0, 0, 0] for img, _ in got])
    labs = np.concatenate([lab for _, lab in got])
    np.testing.assert_array_equal(ids, [0.0, 1.0, 2.0])
    np.testing.assert_array_equal(labs, [10, 11, 12])


def test_probe_npz_roundtrip_preserves_probs(tmp_path):
    """The curve caches the fitted probe as .npz next to the manifest;
    reloading it must reproduce identical probabilities (0-d scalar fields
    included)."""
    from objgan_tpu.utils.eval_metrics import fit_class_probe, probe_probs
    from objgan_tpu.utils.fid_runner import save_npz_atomic

    rng = np.random.default_rng(5)
    feats = rng.normal(size=(40, 8))
    labels = rng.integers(0, 5, size=40)
    probe = fit_class_probe(feats, labels, 5, iters=50)
    path = str(tmp_path / ".fid_lite_probe_x.npz")
    save_npz_atomic(path, **probe)
    loaded = dict(np.load(path))
    np.testing.assert_array_equal(probe_probs(loaded, feats),
                                  probe_probs(probe, feats))
    assert float(loaded["train_acc"]) == probe["train_acc"]


def test_retrieval_stats_perfect_collapsed_and_partial():
    from objgan_tpu.utils.eval_metrics import retrieval_stats

    rng = np.random.default_rng(3)
    feats = rng.normal(size=(40, 16))
    # perfect alignment: every true caption ranks first
    rs = retrieval_stats(feats, feats)
    assert rs["mean_rank"] == 1.0 and rs["recall_at_1"] == 1.0
    assert rs["pool"] == 40
    # collapsed embeddings: all similarities tie -> worst rank everywhere,
    # never a spurious 1.0 (the tie-below convention)
    ones = np.ones((40, 16))
    rs_c = retrieval_stats(ones, ones)
    assert rs_c["mean_rank"] == 40.0 and rs_c["recall_at_1"] == 0.0
    # unrelated embeddings: mean rank near the pool middle, far from 1
    rs_r = retrieval_stats(rng.normal(size=(40, 16)), feats)
    assert 5.0 < rs_r["mean_rank"] < 40.0
    assert rs_r["recall_at_1"] < 0.5
    # noisy-but-aligned sits between perfect and random AND keeps moving
    # as noise shrinks (the discrimination property R-precision lost)
    noisy_hi = retrieval_stats(feats + 0.8 * rng.normal(size=(40, 16)),
                               feats)
    noisy_lo = retrieval_stats(feats + 0.2 * rng.normal(size=(40, 16)),
                               feats)
    assert 1.0 <= noisy_lo["mean_rank"] < noisy_hi["mean_rank"]


def test_frozen_artifact_roundtrip(tmp_path):
    from objgan_tpu.tools.freeze_probe import (
        load_frozen_artifact, save_frozen_artifact,
    )

    rng = np.random.default_rng(0)
    enc_params = {"params": {"conv": {"kernel": rng.normal(
        size=(3, 3, 3, 8)).astype(np.float32)}}}
    probe = {"w": rng.normal(size=(8, 5)), "b": np.zeros(5),
             "mu": np.zeros(8), "sd": np.ones(8),
             "train_acc": np.float64(0.9), "holdout_acc": np.float64(0.8)}
    p = str(tmp_path / "frozen.npz")
    save_frozen_artifact(p, enc_params, probe, embedding_dim=8,
                         image_size=16, n_classes=5)
    params2, probe2, meta = load_frozen_artifact(p)
    np.testing.assert_array_equal(
        params2["params"]["conv"]["kernel"],
        enc_params["params"]["conv"]["kernel"])
    np.testing.assert_array_equal(probe2["w"], probe["w"])
    assert meta == {"embedding_dim": 8, "image_size": 16, "n_classes": 5,
                    "backbone": "lite"}
    assert not any(f.endswith(".tmp.npz") for f in
                   __import__("os").listdir(tmp_path))
