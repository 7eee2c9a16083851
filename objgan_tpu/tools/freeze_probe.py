"""Freeze ONE cross-manifest lite-IS probe as a committed artifact.

VERDICT r4 weak #3 / next #4: the 81-way lite-IS probe is fit per-manifest
on each run's OWN trained DAMSM encoder, so its scale is not comparable
across curves (r3b's ~5.1 and the 10k curve's ~3.3 live in different
feature spaces) — exactly where the data-scaling narrative needs it. The
fix freezes BOTH halves of the metric:

  * the FEATURE SPACE: one DAMSM image encoder's params, trained once on
    the committed reference manifest (data_proc2k) and stored in the
    artifact — every future eval extracts frozen features with it;
  * the CLASS HEAD: one 81-way linear probe fit on that manifest's real
    images in that frozen space.

``gan/eval.py`` loads the artifact (default assets/frozen_lite.npz) in
lite mode and prints an additional "frozen lite-IS" line whose scale is
comparable across any procedural manifest. The per-manifest probe IS
remains the in-curve column (labeled), the frozen one the cross-curve
column.

Usage (one-time, after a DAMSM pretrain on the reference manifest):

    python -m objgan_tpu.tools.freeze_probe --cfg <yml> \
        --manifest data_proc2k/manifest.json \
        [--damsm <ckpt dir>] [--out assets/frozen_lite.npz]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

_META_KEYS = ("embedding_dim", "image_size", "n_classes")


def save_frozen_artifact(path: str, enc_params, probe: dict, *,
                         embedding_dim: int, image_size: int,
                         n_classes: int, backbone: str = "lite") -> None:
    """One .npz: flattened encoder params + probe + the config fields
    needed to rebuild the extractor independent of the eval run's cfg."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(enc_params, sep="/")
    payload = {f"enc/{k}": np.asarray(v) for k, v in flat.items()}
    for k, v in probe.items():
        payload[f"probe/{k}"] = np.asarray(v)
    payload["meta/embedding_dim"] = np.int64(embedding_dim)
    payload["meta/image_size"] = np.int64(image_size)
    payload["meta/n_classes"] = np.int64(n_classes)
    payload["meta/backbone"] = np.str_(backbone)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)


def load_frozen_artifact(path: str):
    """Returns (enc_params pytree, probe dict, meta dict)."""
    from flax import traverse_util

    z = np.load(path, allow_pickle=False)
    enc = {k[len("enc/"):]: z[k] for k in z.files if k.startswith("enc/")}
    params = traverse_util.unflatten_dict(enc, sep="/")
    probe = {k[len("probe/"):]: z[k] for k in z.files
             if k.startswith("probe/")}
    meta = {k: int(z[f"meta/{k}"]) for k in _META_KEYS}
    meta["backbone"] = str(z["meta/backbone"])
    return params, probe, meta


def make_frozen_extractor(path: str):
    """(extract_fn, probe, meta) from a frozen artifact — the extractor
    rebuilds the lite encoder at the ARTIFACT's dims (not the eval cfg's),
    resizing incoming images if the eval resolution differs."""
    import jax
    import jax.numpy as jnp

    from objgan_tpu.core.config import Config
    from objgan_tpu.models.damsm import build_image_encoder

    params, probe, meta = load_frozen_artifact(path)
    if meta["backbone"] != "lite":
        raise ValueError(f"frozen artifact backbone {meta['backbone']!r} "
                         "unsupported (expected 'lite')")
    cfg = Config().merged({"TEXT": {"EMBEDDING_DIM": meta["embedding_dim"],
                                    "CNN_BACKBONE": "lite"}})
    enc = build_image_encoder(cfg)
    size = meta["image_size"]
    variables = {"params": params["params"]} if "params" in params \
        else params

    @jax.jit
    def extract(images):
        x = images.astype(jnp.float32)
        if x.shape[1] != size:
            x = jax.image.resize(
                x, (x.shape[0], size, size, x.shape[-1]), method="bilinear")
        _, global_f = enc.apply(variables, x)
        return global_f

    return extract, probe, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", dest="cfg_file", default=None)
    ap.add_argument("--manifest", required=True,
                    help="reference manifest the frozen space is fit on "
                         "(the committed data_proc2k)")
    ap.add_argument("--damsm", default=None,
                    help="DAMSM ckpt dir (default: cfg TRAIN.NET_E or "
                         "OUTPUT_DIR/<name>_damsm/ckpt)")
    ap.add_argument("--out", default="assets/frozen_lite.npz")
    args = ap.parse_args()

    import jax

    from objgan_tpu.core.config import Config, cfg_from_file
    from objgan_tpu.data.pipeline import CocoFeed, load_records_json
    from objgan_tpu.data.tokenizer import Vocab
    from objgan_tpu.utils.eval_metrics import fit_class_probe
    from objgan_tpu.utils.fid_runner import (
        make_lite_extractor, unique_epoch_batches,
    )

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    if args.damsm:
        cfg = cfg.merged({"TRAIN": {"NET_E": args.damsm}})
    cfg = cfg.replace(DATA_DIR=os.path.dirname(args.manifest) or ".")
    records = load_records_json(args.manifest)
    vocab = Vocab.build(c for r in records for c in r["captions"])
    feed = CocoFeed(cfg, records, vocab, seed=cfg.RNG_SEED, augment=False,
                    with_masks=False)
    first = next(iter(feed))

    from objgan_tpu.cli import load_damsm_encoders

    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    _, img_params = load_damsm_encoders(cfg, rng, first)
    if img_params is None:
        raise SystemExit(
            "no pretrained DAMSM checkpoint found — a frozen probe over an "
            "untrained encoder would freeze noise; pretrain first "
            "(gan/pretrain_DAMSM.py) and pass --damsm its ckpt dir")
    extractor, _ = make_lite_extractor(cfg, params=img_params)

    acts, labs = [], []
    for img, lab in unique_epoch_batches(feed, len(records)):
        acts.append(np.asarray(extractor(jax.numpy.asarray(img))[0]))
        labs.append(lab)
    acts = np.concatenate(acts)
    labs = np.concatenate(labs)
    probe = fit_class_probe(acts, labs, cfg.OBJ.NUM_CLASSES)
    print(f"frozen probe fit on {len(records)} real images: "
          f"train acc {probe['train_acc']:.3f}, "
          f"holdout acc {probe['holdout_acc']:.3f}")
    save_frozen_artifact(
        args.out, img_params, probe,
        embedding_dim=cfg.TEXT.EMBEDDING_DIM,
        image_size=cfg.branch_sizes[-1],
        n_classes=cfg.OBJ.NUM_CLASSES)
    print(f"wrote {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
