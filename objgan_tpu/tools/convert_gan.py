"""Lineage GAN checkpoint conversion CLI (`NET_G` flow).

The reference samples/resumes from ``TRAIN.NET_G`` (``netG_epoch_N.pth``)
and per-scale ``netD*.pth`` files. This tool best-effort-loads those state
dicts through the documented name maps (``core/name_maps.py`` —
BatchNorm/layout-conditioning divergences skip with a printed report) into
a ``GanTrainState`` Orbax checkpoint this framework's samplers/trainers
consume:

    python -m objgan_tpu.tools.convert_gan --cfg cfg/coco_objgan.yml \\
        --g_pth netG_epoch_600.pth \\
        --d_pth netD64.pth --d_pth netD128.pth --d_pth netD256.pth \\
        --out /ckpts/coco_gan_converted

then set ``TRAIN.NET_G: /ckpts/coco_gan_converted`` (sampling restores
from exactly that directory; see cli.py:sample_gan).
"""

from __future__ import annotations

import argparse

import jax


def _report(tag: str, report: dict) -> None:
    print(f"{tag}: loaded {len(report['loaded'])} params; "
          f"skipped {len(report['skipped_bn'])} BatchNorm entries "
          f"(GroupNorm divergence), {len(report['skipped_shape'])} "
          f"shape-mismatched, {len(report['missing_target'])} "
          f"missing-target (stale map entry / shrunken config), "
          f"{len(report['unmapped'])} unmapped")
    for name in report["skipped_shape"]:
        print(f"  shape-mismatch: {name}")
    for name in report["missing_target"]:
        print(f"  missing-target: {name}")


def convert(cfg, g_pth: str | None, d_pths, out_dir: str):
    """Build a ``GanTrainState`` with lineage G/D weights loaded and save it
    as an Orbax step-0 checkpoint under ``out_dir``. Returns the state."""
    from objgan_tpu.core import checkpoint as ckpt
    from objgan_tpu.core.name_maps import (
        d_net_name_map, g_net_name_map, load_lineage_partial,
    )
    from objgan_tpu.data.synthetic import synthetic_batch
    from objgan_tpu.tools.convert_damsm import _load_state_dict
    from objgan_tpu.train.gan import GanTrainer

    sizes = cfg.branch_sizes
    if d_pths and len(d_pths) != len(sizes):
        raise SystemExit(f"--d_pth must be given once per pyramid scale "
                         f"{sizes} in that order (got {len(d_pths)})")

    trainer = GanTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        batch = synthetic_batch(cfg, rng, 2)
        # Seed the state's DAMSM encoders from TRAIN.NET_E: a full-state
        # restore of this checkpoint later (cli.sample_gan / gan/eval.py)
        # OVERWRITES whatever encoders the restorer loaded first, so random
        # encoders baked in here would silently clobber pretrained ones.
        from objgan_tpu.cli import load_damsm_encoders

        text_params, img_params = load_damsm_encoders(cfg, rng, batch)
        if text_params is None:
            print("WARNING: no pretrained DAMSM checkpoint found "
                  "(TRAIN.NET_E) — the converted GanTrainState will carry "
                  "RANDOM text/image encoders, and restoring it overwrites "
                  "any encoders loaded at sampling time. Run "
                  "tools/convert_damsm first and set TRAIN.NET_E, then "
                  "re-convert.")
        state = trainer.init_state(rng, batch, text_params=text_params,
                                   img_params=img_params)
        if g_pth:
            g_sd = _load_state_dict(g_pth)
            g_params, rep = load_lineage_partial(
                state.g_params, g_sd, g_net_name_map(cfg))
            _report("G_NET", rep)
            # sampling uses the EMA copy; seed it with the same weights
            state = state.replace(g_params=g_params, ema_g_params=g_params)
        if d_pths:
            new_d = []
            for params, pth, size in zip(state.d_params, d_pths, sizes):
                d_sd = _load_state_dict(pth)
                loaded, rep = load_lineage_partial(
                    params, d_sd, d_net_name_map(cfg, size))
                _report(f"D_NET{size}", rep)
                new_d.append(loaded)
            state = state.replace(d_params=tuple(new_d))

    manager = ckpt.make_manager(out_dir)
    ckpt.save(manager, 0, state)
    manager.wait_until_finished()
    print(f"wrote Orbax GanTrainState checkpoint (step 0) to {out_dir}\n"
          f"point cfg.TRAIN.NET_G at this directory for sampling, or use "
          f"it as the training ckpt dir to resume")
    return state


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--cfg", dest="cfg_file", default=None)
    ap.add_argument("--g_pth", default=None, help="lineage netG_epoch_N.pth")
    ap.add_argument("--d_pth", action="append", default=[],
                    help="lineage netD .pth, once per scale (64, 128, 256)")
    ap.add_argument("--out", required=True,
                    help="output Orbax checkpoint directory (NET_G target)")
    args = ap.parse_args()
    if not args.g_pth and not args.d_pth:
        ap.error("give at least one of --g_pth / --d_pth")

    from objgan_tpu.core.config import Config, cfg_from_file

    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else Config()
    convert(cfg, args.g_pth, args.d_pth, args.out)


if __name__ == "__main__":
    main()
