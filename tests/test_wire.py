"""uint8 wire-format batches + device-side pyramid (data/wire.py) and the
prefetching K-step loop (cli._PrefetchFeed) — VERDICT r2 "next" #1."""

import itertools

import jax
import numpy as np
import pytest

from objgan_tpu.data.pipeline import CocoFeed, _resize_area
from objgan_tpu.data.tokenizer import Vocab
from objgan_tpu.data.wire import WIRE_IMAGE, WIRE_SHAPES, from_wire, is_wire


def _records(n=6, size=64):
    rng = np.random.default_rng(7)
    recs = []
    for i in range(n):
        k = int(rng.integers(1, 4))
        recs.append({
            "captions": [f"a cat number {i}", f"another cat {i}"],
            "labels": rng.integers(1, 7, k).tolist(),
            "boxes": rng.uniform(0.1, 0.4, (k, 4)).tolist(),
            "polygons": [rng.uniform(0, 1, (6, 2)) for _ in range(k)],
            "image": rng.integers(0, 255, (size, size, 3)).astype(np.uint8),
        })
    return recs


class TestFromWire:
    def test_pyramid_is_exact_boxfilter_of_finest(self, tiny_cfg):
        """Coarse scales must equal integer-factor means of the finest scale
        (and thereby _resize_area of the original when the original IS the
        finest scale — the documented divergence is zero in that case)."""
        rng = np.random.default_rng(0)
        sizes = tiny_cfg.branch_sizes
        u8 = rng.integers(0, 256, (2, sizes[-1], sizes[-1], 3),
                          dtype=np.uint8)
        out = from_wire(tiny_cfg, {WIRE_IMAGE: u8})
        assert [im.shape[1] for im in out["images"]] == list(sizes)
        f = u8.astype(np.float32) / 127.5 - 1.0
        for im, sz in zip(out["images"], sizes):
            want = np.stack([_resize_area(x, sz) for x in f])
            np.testing.assert_allclose(np.asarray(im), want, atol=1e-5)

    def test_identity_for_classic_batches(self, tiny_cfg):
        batch = {"captions": np.zeros((2, 4), np.int32)}
        assert from_wire(tiny_cfg, batch) is batch
        assert not is_wire(batch)

    def test_shapes_roundtrip(self, tiny_cfg):
        # wire masks are 255-quantized (see pipeline._wire_base): binary
        # masks round-trip exactly, soft masks within 1/510
        m = (np.random.default_rng(1).random((2, 3, 8, 8)) > 0.5)
        out = from_wire(tiny_cfg, {WIRE_SHAPES: m.astype(np.uint8) * 255})
        assert out["shapes"].dtype == np.float32
        np.testing.assert_array_equal(np.asarray(out["shapes"]),
                                      m.astype(np.float32))
        soft = np.random.default_rng(2).random((1, 2, 8, 8)).astype(np.float32)
        enc = np.clip(np.round(soft * 255.0), 0, 255).astype(np.uint8)
        dec = np.asarray(from_wire(tiny_cfg, {WIRE_SHAPES: enc})["shapes"])
        np.testing.assert_allclose(dec, soft, atol=1.0 / 510)


class TestWireFeed:
    def test_wire_batch_expands_to_classic(self, tiny_cfg):
        """augment=False: the expanded wire batch must match the classic
        feed's batch (images within the u8-rounding half-LSB of the PIL
        path; layout/captions exactly)."""
        vocab = Vocab.build(["a cat number another 0 1 2 3 4 5"])
        recs = _records(size=tiny_cfg.branch_sizes[-1])
        classic = next(iter(CocoFeed(tiny_cfg, recs, vocab, augment=False)))
        wire_b = next(iter(CocoFeed(tiny_cfg, recs, vocab, augment=False,
                                    wire=True)))
        assert is_wire(wire_b)
        expanded = jax.tree.map(np.asarray, from_wire(tiny_cfg, wire_b))
        for k in ("captions", "cap_lens", "labels", "boxes", "obj_valid"):
            np.testing.assert_array_equal(expanded[k], classic[k])
        np.testing.assert_array_equal(expanded["shapes"], classic["shapes"])
        for got, want in zip(expanded["images"], classic["images"]):
            np.testing.assert_allclose(got, want, atol=0.005)

    def test_cache_hit_returns_same_data(self, tiny_cfg):
        vocab = Vocab.build(["a cat number another 0 1 2 3 4 5"])
        recs = _records(2, size=tiny_cfg.branch_sizes[-1])
        feed = CocoFeed(tiny_cfg, recs, vocab, augment=False, wire=True)
        a = feed._one(recs[0], np.random.default_rng(0), rec_id=0)
        assert 0 in feed._cache  # populated
        b = feed._one(recs[0], np.random.default_rng(0), rec_id=0)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_flip_consistency_wire(self, tiny_cfg):
        """Wire-mode flip must stay geometry-consistent: flipped image
        column == unflipped mirror, boxes x0 -> 1-x0-w, masks mirrored."""
        vocab = Vocab.build(["a cat number another 0 1 2 3 4 5"])
        recs = _records(1, size=tiny_cfg.branch_sizes[-1])
        feed = CocoFeed(tiny_cfg, recs, vocab, augment=True, wire=True)
        base = feed._wire_base(recs[0], 0)
        # find a flipped draw
        for seed in range(50):
            rng = np.random.default_rng(seed)
            out = feed._one(recs[0], rng, rec_id=0)
            if not np.array_equal(out[WIRE_IMAGE], base["image_u8"]):
                break
        np.testing.assert_array_equal(out[WIRE_IMAGE],
                                      base["image_u8"][:, ::-1])
        np.testing.assert_array_equal(out[WIRE_SHAPES],
                                      base["masks_u8"][:, :, ::-1])
        n = int(base["valid"].sum())
        np.testing.assert_allclose(
            out["boxes"][:n, 0],
            1.0 - base["boxes"][:n, 0] - base["boxes"][:n, 2], rtol=1e-6)


class TestWireTraining:
    def test_gan_step_and_sample_on_wire_batch(self, tiny_cfg):
        from objgan_tpu.train.gan import GanTrainer

        cfg = tiny_cfg.replace(DTYPE="float32")
        vocab = Vocab.build(["a cat number another 0 1 2 3 4 5"])
        recs = _records(8, size=cfg.branch_sizes[-1])
        batch = next(iter(CocoFeed(cfg, recs, vocab, wire=True)))
        tr = GanTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        state, m = tr.jitted_train_step(donate=False)(
            state, batch, jax.random.PRNGKey(1))
        assert all(np.isfinite(float(v)) for v in m.values())
        out = tr.jitted_sample()(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(out["images"][-1])).all()

    def test_prefetch_loop_trains_and_flushes_tail(self, tiny_cfg, tmp_path):
        """_PrefetchFeed: K-stacked execs plus the bounded-feed tail path
        must together consume every batch exactly once."""
        from objgan_tpu import cli
        from objgan_tpu.core import checkpoint as ckpt
        from objgan_tpu.core.metrics import MetricsWriter
        from objgan_tpu.train.box import BoxTrainer

        cfg = tiny_cfg.replace(DTYPE="float32", OUTPUT_DIR=str(tmp_path)) \
            .merged({"TRAIN": {"BATCH_SIZE": 8, "STEPS_PER_EXECUTION": 2}})
        from objgan_tpu.data.synthetic import synthetic_batch

        batches = [synthetic_batch(cfg, jax.random.PRNGKey(i),
                                   with_images=False) for i in range(5)]
        tr = BoxTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), batches[0])
        mgr = ckpt.make_manager(str(tmp_path / "ck"))
        writer = MetricsWriter(str(tmp_path), "box")
        final = cli._run_loop(
            cfg, "box", state, tr.jitted_train_step(), iter(batches),
            writer, mgr, max_steps=100,
            multi_step_fn=tr.jitted_multi_step(donate=False),
        )
        # 5 batches at K=2 -> two stacked execs + one tail step = 5 steps
        assert int(final.step) == 5


def test_wire_cache_policy_is_byte_budgeted(tiny_cfg, monkeypatch):
    """The wire cache is gated by predicted footprint vs a quarter of
    physical RAM (per-record bytes are config-determined), not a magic
    record count: real COCO (~118k records, ~28 GB at default dims) must
    cache fully on a large-RAM host, while a dataset that exceeds the
    budget must disable the cache rather than grow without bound. An
    explicit cache_limit still wins."""
    import objgan_tpu.data.pipeline as pl

    # per-record prediction: exact static parts (image + masks) dominate
    b = pl.wire_record_bytes(tiny_cfg)
    s = tiny_cfg.branch_sizes[-1]
    assert b >= s * s * 3 + tiny_cfg.OBJ.MAX_OBJECTS * \
        tiny_cfg.OBJ.SHAPE_SIZE ** 2

    monkeypatch.setattr(pl, "_physical_ram_bytes", lambda: 128 << 30)
    assert pl.wire_cache_allowed(tiny_cfg, 118_000)  # real-COCO scale fits
    monkeypatch.setattr(pl, "_physical_ram_bytes", lambda: 4 << 20)
    assert not pl.wire_cache_allowed(tiny_cfg, 118_000)
    # explicit limit overrides the byte budget in both directions
    assert pl.wire_cache_allowed(tiny_cfg, 118_000, cache_limit=200_000)
    assert not pl.wire_cache_allowed(tiny_cfg, 118_000, cache_limit=100)


def test_cgroup_mem_limit_reads_own_nested_group(tmp_path):
    """The RAM probe must read the limit of the cgroup this PROCESS lives
    in (nested jobs under Slurm/systemd/K8s), taking the tightest limit
    along the ancestor chain — not only the mount root's."""
    from objgan_tpu.data.pipeline import _cgroup_mem_limit

    v1 = tmp_path / "memory"
    nested = v1 / "job" / "task7"
    nested.mkdir(parents=True)
    proc = tmp_path / "cgroup"
    proc.write_text("9:memory:/job/task7\n1:cpu:/job/task7\n")
    # limit on the nested group only; root unlimited (v1 writes a huge int)
    (v1 / "memory.limit_in_bytes").write_text(str(1 << 62))
    (nested / "memory.limit_in_bytes").write_text(str(16 << 30))
    got = _cgroup_mem_limit(proc_file=str(proc),
                            v2_root=str(tmp_path / "nope"),
                            v1_root=str(v1))
    assert got == 16 << 30
    # ancestor tighter than leaf: the walk keeps the minimum
    (v1 / "job" / "memory.limit_in_bytes").write_text(str(8 << 30))
    got = _cgroup_mem_limit(proc_file=str(proc),
                            v2_root=str(tmp_path / "nope"),
                            v1_root=str(v1))
    assert got == 8 << 30
    # cgroup-namespaced container: own path absent under the host mount ->
    # degrade to the mount root's limit (the old behavior)
    proc.write_text("9:memory:/elsewhere/unmapped\n")
    got = _cgroup_mem_limit(proc_file=str(proc),
                            v2_root=str(tmp_path / "nope"),
                            v1_root=str(v1))
    assert got == 1 << 62


def test_with_masks_false_skips_rasterization(tiny_cfg):
    """Stage-A consumes captions+layouts only: with_masks=False must omit
    the mask tensors in both classic and wire modes (no rasterization, no
    dead host->device bytes) while leaving labels/boxes/valid identical."""
    from objgan_tpu.data.pipeline import CocoFeed, wire_record_bytes
    from objgan_tpu.data.tokenizer import Vocab
    from objgan_tpu.data.wire import WIRE_SHAPES

    rng = np.random.default_rng(0)
    recs = []
    for i in range(4):
        k = int(rng.integers(1, 4))
        recs.append({
            "captions": [f"a cat number {i}"],
            "labels": rng.integers(1, 6, k).tolist(),
            "boxes": rng.uniform(0.1, 0.4, (k, 4)).tolist(),
            "polygons": [rng.uniform(0, 1, (5, 2)) for _ in range(k)],
        })
    vocab = Vocab.build(["a cat number one two three"])
    cfg = tiny_cfg.merged({"TRAIN": {"BATCH_SIZE": 4}})
    for wire in (False, True):
        full = next(iter(CocoFeed(cfg, recs, vocab, seed=1, wire=wire,
                                  with_images=False, augment=False)))
        lean = next(iter(CocoFeed(cfg, recs, vocab, seed=1, wire=wire,
                                  with_images=False, with_masks=False,
                                  augment=False)))
        mask_key = WIRE_SHAPES if wire else "shapes"
        assert mask_key in full and mask_key not in lean
        for k in ("labels", "boxes", "obj_valid", "captions"):
            np.testing.assert_array_equal(full[k], lean[k], err_msg=k)
    assert wire_record_bytes(cfg, False, False) < \
        wire_record_bytes(cfg, False, True)
