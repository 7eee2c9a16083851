"""Lineage ``.pth`` → flax name-mapping tables (SURVEY.md §5
"Checkpoint/resume", §7 hard part #5).

The reference saves raw PyTorch ``state_dict``s (``text_encoder.pth``,
``image_encoder.pth``, ``netG_epoch_N.pth``, ``netD*.pth``). These tables map
those public AttnGAN/Obj-GAN module names onto this framework's flax param
paths so :func:`objgan_tpu.core.checkpoint.convert_torch_state_dict` +
``apply_converted`` load them in one call. The reference tree itself is
unavailable (SURVEY.md §0) — the naming below follows the public AttnGAN
``model.py`` lineage Obj-GAN derives from, and every table is unit-tested
against synthetic torch state dicts built with the installed CPU torch
(tests/test_name_maps.py).

Two kinds of entries:

* mapped — layout conversion handled centrally by ``convert_torch_state_dict``
  (Linear/LSTM transposes, OIHW→HWIO, LSTM bias pairs summed).
* skipped — parameters with no counterpart by *documented divergence*: the
  lineage's BatchNorm layers are GroupNorm here (see models/common.py), so BN
  weights/biases/running stats in G_NET / D_NET checkpoints cannot transfer
  and are dropped by :func:`split_convertible`. Conv/Linear weights — the
  overwhelming majority of parameters — transfer exactly.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Mapping, Tuple

import jax


def bilstm_name_map(torch_prefix: str, flax_prefix: str) -> Dict[str, str]:
    """Single-layer bidirectional ``nn.LSTM`` → ``ops/lstm.py:BiLSTM``.

    Torch's per-direction weight pairs transpose to (in, 4H)/(H, 4H); the two
    bias vectors of each direction both map onto the single flax ``b`` and
    are summed by the converter (the cell folds them into one add).
    """
    m: Dict[str, str] = {}
    for tdir, fdir in (("", "fwd"), ("_reverse", "bwd")):
        m[f"{torch_prefix}weight_ih_l0{tdir}"] = f"{flax_prefix}{fdir}_w_ih"
        m[f"{torch_prefix}weight_hh_l0{tdir}"] = f"{flax_prefix}{fdir}_w_hh"
        m[f"{torch_prefix}bias_ih_l0{tdir}"] = f"{flax_prefix}{fdir}_b"
        m[f"{torch_prefix}bias_hh_l0{tdir}"] = f"{flax_prefix}{fdir}_b"
    return m


def rnn_encoder_name_map() -> Dict[str, str]:
    """Lineage ``RNN_ENCODER`` (``text_encoder.pth``): ``encoder``
    (nn.Embedding) + ``rnn`` (bi-LSTM) → models/damsm.py:RNNEncoder."""
    m = {"encoder.weight": "embedding/embedding"}
    m.update(bilstm_name_map("rnn.", "bilstm/"))
    return m


def cnn_encoder_name_map(torch_names: Iterable[str]) -> Dict[str, str]:
    """Lineage ``CNN_ENCODER`` (``image_encoder.pth``) →
    models/inception_v3.py:InceptionEncoder.

    The lineage copies torchvision Inception-v3 submodules onto itself as
    direct attributes (``Conv2d_1a_3x3`` … ``Mixed_7c``) and adds two
    projections: ``emb_features`` (bias-free conv1x1 on Mixed_6e) and
    ``emb_cnn_code`` (nn.Linear on the 2048 pool). Backbone entries reuse the
    mechanical torchvision map under the ``backbone/`` scope."""
    from objgan_tpu.models.inception_v3 import torch_name_map

    out: Dict[str, str] = {}
    backbone = []
    for name in torch_names:
        if name.endswith("num_batches_tracked"):
            continue
        if name == "emb_features.weight":
            out[name] = "emb_features/kernel"
        elif name == "emb_cnn_code.weight":
            out[name] = "emb_cnn_code/kernel"
        elif name == "emb_cnn_code.bias":
            out[name] = "emb_cnn_code/bias"
        else:
            backbone.append(name)
    for tname, fpath in torch_name_map(backbone).items():
        out[tname] = "backbone/" + fpath
    return out


def load_rnn_encoder_checkpoint(params, state_dict):
    """Write a lineage ``text_encoder.pth`` state dict into an
    ``RNNEncoder`` param tree (exact: every parameter transfers)."""
    from objgan_tpu.core.checkpoint import (
        apply_converted, convert_torch_state_dict,
    )

    converted = convert_torch_state_dict(state_dict, rnn_encoder_name_map())
    return apply_converted(params, converted)


def load_cnn_encoder_checkpoint(params, state_dict):
    """Write a lineage ``image_encoder.pth`` state dict into an
    ``InceptionEncoder`` param tree (exact: backbone + both projections)."""
    from objgan_tpu.core.checkpoint import (
        apply_converted, convert_torch_state_dict,
    )

    usable = {k: v for k, v in state_dict.items()
              if not k.startswith("AuxLogits")
              and not k.endswith("num_batches_tracked")}
    converted = convert_torch_state_dict(
        usable, cnn_encoder_name_map(list(usable)))
    return apply_converted(params, converted)


def export_rnn_encoder(params) -> Dict[str, "np.ndarray"]:
    """Inverse of :func:`load_rnn_encoder_checkpoint`: read a trained
    ``RNNEncoder`` param tree out as a lineage ``text_encoder.pth``-shaped
    state dict (exact — every parameter transfers; the LSTM bias splits
    sum-preservingly, see ``checkpoint.export_torch_state_dict``)."""
    from objgan_tpu.core.checkpoint import export_torch_state_dict

    return export_torch_state_dict(params, rnn_encoder_name_map())


def cnn_encoder_export_name_map(params) -> Dict[str, str]:
    """torch→flax map covering an ``InceptionEncoder`` param tree, with the
    torch names generated mechanically from the flax paths (the inverse of
    ``inception_v3.torch_name_map``'s derivation, which the roundtrip test
    validates against torchvision's 94-conv inventory).

    The backbone ``fc`` classifier head is excluded: the lineage
    ``CNN_ENCODER`` keeps torchvision's feature modules only
    (``Conv2d_1a_3x3`` … ``Mixed_7c``) and replaces the classifier with its
    ``emb_features``/``emb_cnn_code`` projections, so its state dict never
    carries ``fc.*``."""
    m: Dict[str, str] = {
        "emb_features.weight": "emb_features/kernel",
        "emb_cnn_code.weight": "emb_cnn_code/kernel",
        "emb_cnn_code.bias": "emb_cnn_code/bias",
    }
    from objgan_tpu.core.checkpoint import _path_key

    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        fpath = _path_key(path)
        if not fpath.startswith("backbone/"):
            continue
        parts = fpath[len("backbone/"):].split("/")
        leaf, scope = parts[-1], parts[:-1]
        if scope == ["fc"]:
            continue
        if leaf == "kernel":
            m[".".join(scope) + ".weight"] = fpath
        elif leaf == "bias":
            m[".".join(scope) + ".bias"] = fpath
        elif leaf.startswith("bn_"):
            tleaf = {"bn_scale": "bn.weight", "bn_bias": "bn.bias",
                     "bn_mean": "bn.running_mean",
                     "bn_var": "bn.running_var"}[leaf]
            m[".".join(scope) + "." + tleaf] = fpath
        else:
            raise KeyError(f"unhandled InceptionEncoder param {fpath!r}")
    return m


def export_cnn_encoder(params) -> Dict[str, "np.ndarray"]:
    """Inverse of :func:`load_cnn_encoder_checkpoint`: read a trained
    ``InceptionEncoder`` param tree out as a lineage
    ``image_encoder.pth``-shaped state dict. BatchNorm
    ``num_batches_tracked`` buffers (dropped on import) are re-emitted as
    int64 zeros so torch's strict ``load_state_dict`` sees a complete dict."""
    import numpy as np

    from objgan_tpu.core.checkpoint import export_torch_state_dict

    out = export_torch_state_dict(params, cnn_encoder_export_name_map(params))
    for name in [n for n in out if n.endswith(".running_mean")]:
        scope = name[: -len("running_mean")]
        out[scope + "num_batches_tracked"] = np.zeros((), np.int64)
    return out


def g_net_name_map(cfg) -> Dict[str, str]:
    """Lineage ``G_NET`` (``netG_epoch_N.pth``) → models/generator.py:GNet —
    best-effort table for :func:`load_lineage_partial`.

    Covered: ``ca_net.fc`` (exact — CANet keeps the lineage fc+GLU+split
    structure), the init-stage fc and up-block convs, the attention
    ``conv_context`` (1x1 conv → ``word_proj`` Dense, squeezed by the
    loader), residual-block convs, the per-stage upsample convs, and the
    bias-free image heads. NOT covered by documented divergence: BatchNorm
    entries (GroupNorm here), the layout-conditioned first up-block (extra
    input channels), and Obj-GAN's object-attention additions (no public
    lineage naming).
    """
    n_up = max(1, (cfg.TREE.BASE_SIZE // 4).bit_length() - 1)
    m = {
        "ca_net.fc.weight": "ca_net/fc/kernel",
        "ca_net.fc.bias": "ca_net/fc/bias",
        "h_net1.fc.0.weight": "init_stage/fc/kernel",
    }
    for k in range(n_up):
        # lineage upBlock = Sequential(Upsample, conv3x3, BN, GLU)
        m[f"h_net1.upsample{k + 1}.1.weight"] = f"init_stage/up{k}/conv/kernel"
    sizes = cfg.branch_sizes
    for i in range(1, cfg.TREE.BRANCH_NUM):
        t = f"h_net{i + 1}"
        f = f"attn_stage{i}"
        m[f"{t}.att.conv_context.weight"] = f"{f}/word_proj/kernel"
        for r in range(cfg.GAN.R_NUM):
            m[f"{t}.residual.{r}.block.0.weight"] = f"{f}/res{r}/conv1/kernel"
            m[f"{t}.residual.{r}.block.3.weight"] = f"{f}/res{r}/conv2/kernel"
        m[f"{t}.upsample.1.weight"] = f"{f}/up/conv/kernel"
    for i, size in enumerate(sizes):
        m[f"img_net{i + 1}.img.0.weight"] = f"img{size}/img/kernel"
    return m


def d_net_name_map(cfg, img_size: int) -> Dict[str, str]:
    """Lineage ``D_NET64/128/256`` (``netD*.pth``) →
    models/discriminator.py:DNet for one pyramid scale.

    Covered: the ``encode_image_by_16times`` trunk convs (except the first,
    whose input grows by the layout-canvas channels here, so it is NOT
    mapped — mapping it would put a permanent 3-vs-4-channel entry in
    ``skipped_shape`` on every load), the deeper down/compress convs of
    D_NET128/256 where widths line up, the ``jointConv`` conditional block
    and both logit heads. BN entries skip.
    """
    m = {
        "img_code_s16.2.weight": "down_blocks_1/Conv_0/kernel",
        "img_code_s16.5.weight": "down_blocks_2/Conv_0/kernel",
        "img_code_s16.8.weight": "down_blocks_3/Conv_0/kernel",
        "COND_DNET.jointConv.0.weight": "cond_block/Conv_0/kernel",
        "COND_DNET.outlogits.0.weight": "cond_logits/kernel",
        "COND_DNET.outlogits.0.bias": "cond_logits/bias",
        "UNCOND_DNET.outlogits.0.weight": "uncond_logits/kernel",
        "UNCOND_DNET.outlogits.0.bias": "uncond_logits/bias",
    }
    if img_size >= 128:
        m["img_code_s32.0.weight"] = "down_blocks_4/Conv_0/kernel"
    if img_size >= 256:
        m["img_code_s64.0.weight"] = "down_blocks_5/Conv_0/kernel"
        m["img_code_s64_1.0.weight"] = "extra/Conv_0/kernel"
    elif img_size >= 128:
        m["img_code_s32_1.0.weight"] = "extra/Conv_0/kernel"
    return m


def load_lineage_partial(params, state_dict: Mapping,
                         name_map: Mapping[str, str]):
    """Best-effort lineage checkpoint import: load every mapped entry whose
    converted shape matches the param tree; 1x1-conv kernels squeeze onto
    Dense targets. Returns ``(params, report)`` where report lists
    ``loaded`` / ``skipped_bn`` / ``skipped_shape`` (target exists, widths
    diverge) / ``missing_target`` (map entry points at a param path absent
    from this model — a stale map or shrunken config, not a width
    mismatch) / ``unmapped`` torch names — callers decide how loud to be
    about the skips."""
    import numpy as np

    from objgan_tpu.core.checkpoint import (
        _path_key, _to_flax_array, apply_converted,
    )

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[_path_key(path)] = leaf

    shapes = {k: tuple(getattr(v, "shape", ())) for k, v in state_dict.items()}
    report = {"loaded": [], "skipped_bn": [], "skipped_shape": [],
              "missing_target": [], "unmapped": []}
    converted = {}
    for tname, tensor in state_dict.items():
        if tname not in name_map:
            key = ("skipped_bn" if is_batchnorm_param(tname, shapes)
                   else "unmapped")
            report[key].append(tname)
            continue
        target = name_map[tname]
        if target not in flat:
            report["missing_target"].append(tname)
            continue
        arr = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") \
            else np.asarray(tensor)
        arr = _to_flax_array(tname, arr, target=target)
        want = flat[target].shape
        if arr.shape != want and arr.ndim == 4 and arr.shape[:2] == (1, 1):
            arr = arr.reshape(arr.shape[2:])  # 1x1 conv -> Dense kernel
        if arr.shape != want:
            report["skipped_shape"].append(tname)
            continue
        converted[target] = arr
        report["loaded"].append(tname)
    return apply_converted(params, converted), report


_BN_LEAVES = ("running_mean", "running_var", "num_batches_tracked")


def is_batchnorm_param(torch_name: str, shapes: Mapping[str, Tuple[int, ...]]
                       ) -> bool:
    """Heuristic for lineage G/D state dicts: BN entries are the running
    stats plus the 1-D ``weight``/``bias`` of the same module scope."""
    if torch_name.endswith(_BN_LEAVES):
        return True
    scope, _, leaf = torch_name.rpartition(".")
    if leaf in ("weight", "bias"):
        return (scope + ".running_mean") in shapes
    return False


def split_convertible(
    state_dict: Mapping, name_map: Mapping[str, str]
) -> Tuple[Dict, List[str], List[str]]:
    """Partition a lineage state dict into
    ``(mapped entries, skipped BatchNorm names, unmapped names)``.

    BatchNorm skips are expected (GroupNorm divergence — documented at
    models/common.py:gn); the caller decides whether the unmapped non-BN
    leftovers are an error.
    """
    shapes = {k: tuple(getattr(v, "shape", ())) for k, v in state_dict.items()}
    mapped, skipped_bn, unmapped = {}, [], []
    for name, value in state_dict.items():
        if name in name_map:
            mapped[name] = value
        elif is_batchnorm_param(name, shapes):
            skipped_bn.append(name)
        else:
            unmapped.append(name)
    return mapped, skipped_bn, unmapped
