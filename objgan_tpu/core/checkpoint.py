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


def save(manager, step: int, state: Any) -> None:
    import orbax.checkpoint as ocp

    manager.save(step, args=ocp.args.StandardSave(state))


def restore_latest(manager, abstract_state: Any) -> Optional[Any]:
    """Restore the newest checkpoint onto the structure of
    ``abstract_state`` (a concrete state works as the template).

    A checkpoint whose tree no longer matches the model (architecture
    changed since it was written) is NOT restored: a loud warning is printed
    and ``None`` returned so the caller starts fresh — matching the
    reference's behavior of simply not passing a NET_G path.
    """
    import orbax.checkpoint as ocp

    step = manager.latest_step()
    if step is None:
        return None
    try:
        return manager.restore(
            step, args=ocp.args.StandardRestore(abstract_state)
        )
    except Exception as e:  # noqa: BLE001 — orbax raises various types
        print(
            "=" * 72
            + f"\nWARNING: checkpoint at step {step} is INCOMPATIBLE with the"
            f"\ncurrent model structure and was NOT restored ({type(e).__name__})."
            "\nTraining will start from fresh parameters. Delete or migrate the"
            "\ncheckpoint directory if this is unexpected.\n" + "=" * 72,
            flush=True,
        )
        return None


def wait(manager) -> None:
    manager.wait_until_finished()


# -- PyTorch interop --------------------------------------------------------


def _to_flax_array(name: str, value: "np.ndarray") -> np.ndarray:
    arr = np.asarray(value)
    if name.endswith(".weight") and arr.ndim == 2:
        return arr.T  # Linear
    if arr.ndim == 4:
        return arr.transpose(2, 3, 1, 0)  # Conv2d OIHW -> HWIO
    return arr


def convert_torch_state_dict(
    state_dict: Mapping[str, Any],
    name_map: Mapping[str, str],
) -> Dict[str, np.ndarray]:
    """Map ``{torch_name: tensor}`` to ``{flax/path/name: array}`` using
    ``name_map`` (torch name -> '/'-joined flax path). LSTM ``weight_ih``
    and ``weight_hh`` 2-D weights transpose like Linear; gate order is
    already i|f|g|o on both sides. Unmapped torch keys raise."""
    out: Dict[str, np.ndarray] = {}
    for tname, tensor in state_dict.items():
        if tname not in name_map:
            raise KeyError(f"no mapping for torch param {tname!r}")
        arr = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else (
            np.asarray(tensor)
        )
        out[name_map[tname]] = _to_flax_array(tname, arr)
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
