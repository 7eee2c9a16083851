"""Checkpoint/resume via Orbax (SURVEY.md §5 "Checkpoint/resume").

The reference ``torch.save``s raw state_dicts at epoch intervals
(``netG_epoch_N.pth`` etc.) and resumes from cfg paths. Here every stage's
train-state pytree is checkpointed with an async Orbax ``CheckpointManager``
(keep-N, atomic), and resume is restore-latest-or-init.

``convert_torch_state_dict`` is the ``.pth -> JAX`` bridge: it maps a
PyTorch state_dict onto a flax param tree given a name-mapping table,
handling the layout differences once, centrally:
  * Linear:  torch (out, in)  -> flax kernel (in, out)       [transpose]
  * Conv2d:  torch (out, in, kh, kw) -> flax (kh, kw, in, out) [transpose]
  * LSTM:    torch weight_ih_l0 (4H, in) -> ops.lstm w_ih (in, 4H); the
             i|f|g|o gate order already matches ops/lstm.py by design.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np


def make_manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def latest_step_in(directory: str) -> Optional[int]:
    """Newest COMPLETED checkpoint step in ``directory`` by filesystem scan
    — no manager construction and, crucially, no model init, so callers can
    decide "already trained past max_steps?" in milliseconds. Orbax step
    dirs are bare integers; `*.orbax-checkpoint-tmp` leftovers from
    interrupted async saves are ignored."""
    if not os.path.isdir(directory):
        return None
    steps = [int(n) for n in os.listdir(directory) if n.isdigit()]
    return max(steps) if steps else None


def save(manager, step: int, state: Any) -> None:
    import orbax.checkpoint as ocp

    manager.save(step, args=ocp.args.StandardSave(state))


def restore_latest(manager, abstract_state: Any) -> Optional[Any]:
    """Restore the newest checkpoint onto the structure of
    ``abstract_state`` (a concrete state works as the template).

    A checkpoint whose tree no longer matches the model (architecture
    changed since it was written) is NOT restored: a loud warning (with the
    underlying error) is printed and ``None`` returned so the caller starts
    fresh — matching the reference's behavior of simply not passing a NET_G
    path. Only structure/shape mismatches get that fallback: a transient
    I/O failure (filesystem blip, interrupted read) RAISES instead —
    silently reinitializing at step 0 would keep saving and rotate the good
    checkpoints out of max_to_keep, destroying the run it was resuming;
    crashing lets the supervisor (tools/watchdog.py recipes) relaunch and
    the retry restore succeed.
    """
    import orbax.checkpoint as ocp

    step = manager.latest_step()
    if step is None:
        return None
    try:
        return manager.restore(
            step, args=ocp.args.StandardRestore(abstract_state)
        )
    except (ValueError, KeyError, TypeError) as e:  # structure mismatch
        import traceback

        print(
            "=" * 72
            + f"\nWARNING: checkpoint at step {step} is INCOMPATIBLE with the"
            f"\ncurrent model structure and was NOT restored:"
            f"\n{traceback.format_exception_only(type(e), e)[-1].strip()}"
            "\nTraining will start from fresh parameters. Delete or migrate the"
            "\ncheckpoint directory if this is unexpected.\n" + "=" * 72,
            flush=True,
        )
        return None


def wait(manager) -> None:
    manager.wait_until_finished()


# -- PyTorch interop --------------------------------------------------------


def _to_flax_array(name: str, value: "np.ndarray",
                   target: str = "") -> np.ndarray:
    arr = np.asarray(value)
    leaf = name.rsplit(".", 1)[-1]
    if target.rsplit("/", 1)[-1] == "embedding":
        return arr  # nn.Embedding (V, D) == flax nn.Embed — no transpose
    is_lstm_w = "weight_ih" in leaf or "weight_hh" in leaf
    if arr.ndim == 2 and (name.endswith(".weight") or is_lstm_w):
        return arr.T  # Linear (out,in)->(in,out); LSTM (4H,D)->(D,4H)
    if arr.ndim == 4:
        return arr.transpose(2, 3, 1, 0)  # Conv2d OIHW -> HWIO
    return arr


def _lstm_bias_kind(name: str) -> Optional[str]:
    leaf = name.rsplit(".", 1)[-1]
    if "bias_ih" in leaf:
        return "bias_ih"
    if "bias_hh" in leaf:
        return "bias_hh"
    return None


def convert_torch_state_dict(
    state_dict: Mapping[str, Any],
    name_map: Mapping[str, str],
) -> Dict[str, np.ndarray]:
    """Map ``{torch_name: tensor}`` to ``{flax/path/name: array}`` using
    ``name_map`` (torch name -> '/'-joined flax path). LSTM ``weight_ih``
    and ``weight_hh`` 2-D weights transpose like Linear; gate order is
    already i|f|g|o on both sides. Torch's two LSTM bias vectors
    (``bias_ih`` + ``bias_hh``) may both map to the same flax ``b`` path —
    the cell folds them into one add — and are SUMMED; any other duplicate
    target path raises. Unmapped torch keys raise."""
    out: Dict[str, np.ndarray] = {}
    src: Dict[str, str] = {}
    for tname, tensor in state_dict.items():
        if tname not in name_map:
            raise KeyError(f"no mapping for torch param {tname!r}")
        arr = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else (
            np.asarray(tensor)
        )
        key = name_map[tname]
        arr = _to_flax_array(tname, arr, target=key)
        if key in out:
            kinds = {_lstm_bias_kind(src[key]), _lstm_bias_kind(tname)}
            if kinds == {"bias_ih", "bias_hh"}:
                out[key] = out[key] + arr
            else:
                raise ValueError(
                    f"both {src[key]!r} and {tname!r} map to flax path "
                    f"{key!r} (only LSTM bias_ih/bias_hh pairs may share a "
                    "target)"
                )
        else:
            out[key] = arr
            src[key] = tname
    return out


def _from_flax_array(torch_name: str, arr: "np.ndarray",
                     source: str = "") -> np.ndarray:
    """Inverse of :func:`_to_flax_array`: flax layout → torch layout.

    Same dispatch rules, transposed: embeddings pass through, 2-D
    Linear/LSTM weights transpose back to (out, in) / (4H, D), 4-D conv
    kernels go HWIO → OIHW."""
    arr = np.asarray(arr)
    leaf = torch_name.rsplit(".", 1)[-1]
    if source.rsplit("/", 1)[-1] == "embedding":
        return arr
    is_lstm_w = "weight_ih" in leaf or "weight_hh" in leaf
    if arr.ndim == 2 and (torch_name.endswith(".weight") or is_lstm_w):
        return np.ascontiguousarray(arr.T)
    if arr.ndim == 4:
        return np.ascontiguousarray(arr.transpose(3, 2, 0, 1))
    return arr


def export_torch_state_dict(
    params: Any,
    name_map: Mapping[str, str],
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_state_dict`: read a flax param tree
    back out as ``{torch_name: array}`` in torch layouts, driven by the
    same ``torch name -> flax path`` map the import direction uses — so any
    exactly-mapped module (RNN_ENCODER, CNN_ENCODER) round-trips.

    The one non-bijective import rule is inverted sum-preservingly: torch's
    two LSTM bias vectors (``bias_ih`` + ``bias_hh``) import SUMMED onto a
    single flax ``b``, so the export writes ``bias_ih = b`` and
    ``bias_hh = 0`` — torch's LSTM cell only ever consumes their sum, so
    the exported checkpoint is numerically identical in any torch forward."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[_path_key(path)] = leaf

    by_target: Dict[str, list] = {}
    for tname, fpath in name_map.items():
        by_target.setdefault(fpath, []).append(tname)

    out: Dict[str, np.ndarray] = {}
    for fpath, tnames in by_target.items():
        if fpath not in flat:
            raise KeyError(f"flax param path {fpath!r} not found")
        arr = np.asarray(flat[fpath])
        if len(tnames) == 1:
            out[tnames[0]] = _from_flax_array(tnames[0], arr, source=fpath)
            continue
        kinds = {_lstm_bias_kind(t): t for t in tnames}
        if len(tnames) != 2 or set(kinds) != {"bias_ih", "bias_hh"}:
            raise ValueError(
                f"multiple torch params {tnames!r} map to flax path "
                f"{fpath!r} (only LSTM bias_ih/bias_hh pairs may share a "
                "target)"
            )
        out[kinds["bias_ih"]] = arr.copy()
        out[kinds["bias_hh"]] = np.zeros_like(arr)
    return out


def _path_key(path) -> str:
    """'/'-joined flax path, dropping the top-level 'params' collection so
    converter name maps don't have to carry it."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if keys and keys[0] == "params":
        keys = keys[1:]
    return "/".join(keys)


def apply_converted(params: Any, converted: Mapping[str, np.ndarray]) -> Any:
    """Write converted arrays into a flax param pytree by '/'-joined path
    (relative to the 'params' collection); shapes must match exactly."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lookup = {}
    for path, leaf in flat:
        lookup[_path_key(path)] = leaf

    updated = dict(lookup)
    for key, arr in converted.items():
        if key not in lookup:
            raise KeyError(f"flax param path {key!r} not found")
        if lookup[key].shape != arr.shape:
            raise ValueError(
                f"shape mismatch at {key}: {lookup[key].shape} vs {arr.shape}"
            )
        updated[key] = jax.numpy.asarray(arr, lookup[key].dtype)

    def rebuild(path, leaf):
        return updated[_path_key(path)]

    return jax.tree_util.tree_map_with_path(rebuild, params)
