"""Host-feed + transfer breakdown profiler (VERDICT r2 weak #1: "nobody has
measured the breakdown" of the 7x real-data training gap).

Times, on a real manifest, each stage of the path from disk to the device:

  1. record transform (PIL decode + pyramid + rasterize + tokenize), per rec
  2. batch assembly (CocoFeed per-batch, collate included)
  3. K-stack (np.stack of TRAIN.STEPS_PER_EXECUTION batches)
  4. host->device transfer of the stacked pytree (put + block), with bytes
  5. the K-step train execution itself (for the duty-cycle comparison)

Run on TPU:  python -m objgan_tpu.tools.profile_feed --cfg cfg/coco_objgan.yml \
                 --manifest <dir>/manifest.json [--steps 3]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sizeof(tree) -> int:
    import jax

    return sum(x.nbytes for x in jax.tree.leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", dest="cfg_file", default=None)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--data_dir", default=None,
                    help="image root (default: the manifest's directory)")
    ap.add_argument("--wire", action="store_true",
                    help="profile the uint8 wire feed instead of classic")
    ap.add_argument("--k", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--train", action="store_true",
                    help="also time the K-step train execution (compiles)")
    args = ap.parse_args()

    import jax

    from objgan_tpu.core.config import Config, cfg_from_file
    from objgan_tpu.data.pipeline import CocoFeed, load_records_json
    from objgan_tpu.data.tokenizer import Vocab

    import os

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    cfg = cfg.replace(DATA_DIR=args.data_dir
                      or os.path.dirname(args.manifest) or ".")
    k = args.k or max(1, cfg.TRAIN.STEPS_PER_EXECUTION)
    records = load_records_json(args.manifest)
    vocab = Vocab.build(c for r in records for c in r["captions"])
    feed = CocoFeed(cfg, records, vocab, seed=0, wire=args.wire)
    b = cfg.TRAIN.BATCH_SIZE
    if args.wire:  # pre-fill the deterministic cache so timings are steady
        if feed._cache is None:
            print("NOTE: wire cache disabled by the byte-budget policy "
                  "(dataset footprint exceeds a quarter of RAM) — the "
                  "timings below are the cache-COLD recompute path")
        else:
            for i, r in enumerate(records):
                feed._wire_base(r, i)

    # -- 1. per-record transform --------------------------------------
    rng = np.random.default_rng(0)
    n_rec = min(len(records), 64)
    t0 = time.perf_counter()
    for i in range(n_rec):
        feed._one(records[i % len(records)], rng=rng, rec_id=i)
    t_rec = (time.perf_counter() - t0) / n_rec
    print(f"1. record transform: {t_rec * 1e3:.2f} ms/record "
          f"({1 / t_rec:.0f} rec/s single-core)")

    # -- 2. per-batch assembly ----------------------------------------
    it = iter(feed)
    next(it)  # warm any lazy native build
    t0 = time.perf_counter()
    batches = [next(it) for _ in range(k)]
    t_batch = (time.perf_counter() - t0) / k
    print(f"2. batch assembly: {t_batch * 1e3:.1f} ms/batch-{b} "
          f"-> feed ceiling {1 / t_batch:.2f} steps/s")

    # -- 3. K-stack ----------------------------------------------------
    t0 = time.perf_counter()
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    t_stack = time.perf_counter() - t0
    nbytes = _sizeof(stacked)
    print(f"3. K={k} stack: {t_stack * 1e3:.1f} ms "
          f"({nbytes / 1e6:.1f} MB pytree)")

    # -- 4. host->device transfer -------------------------------------
    from jax.sharding import NamedSharding, PartitionSpec as P

    from objgan_tpu.parallel.sharding import make_mesh

    mesh = make_mesh()
    sharding = NamedSharding(mesh, P(None, "data"))
    for rep in range(args.reps):
        t0 = time.perf_counter()
        dev = jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)
        jax.block_until_ready(dev)
        t_put = time.perf_counter() - t0
        print(f"4. host->device put (rep {rep}): {t_put * 1e3:.1f} ms "
              f"-> {nbytes / t_put / 1e9:.2f} GB/s effective")

    # -- 5. the train execution itself --------------------------------
    if args.train:
        from objgan_tpu.train.gan import GanTrainer

        trainer = GanTrainer(cfg)
        with jax.default_device(jax.devices("cpu")[0]):
            state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
        state = jax.device_put(state, jax.devices()[0])
        multi = trainer.jitted_multi_step(donate=True)
        state, m = multi(state, dev, jax.random.PRNGKey(1))
        jax.block_until_ready(m)  # compile + warm
        t0 = time.perf_counter()
        state, m = multi(state, dev, jax.random.PRNGKey(2))
        jax.block_until_ready(m)
        t_train = time.perf_counter() - t0
        print(f"5. K={k} train execution: {t_train * 1e3:.1f} ms "
              f"({t_train / k * 1e3:.1f} ms/step)")
        total = t_batch * k + t_stack + t_put + t_train
        print(f"=> serial loop estimate: {total / k * 1e3:.1f} ms/step "
              f"({k / total:.2f} steps/s); device duty cycle "
              f"{t_train / total * 100:.0f}%")


if __name__ == "__main__":
    main()
