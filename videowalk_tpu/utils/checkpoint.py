"""Checkpointing with reference (.pth) format compatibility.

The reference saves torch-pickle dicts
``{model, optimizer, lr_scheduler, epoch, args}`` to ``model_{epoch}.pth`` +
rolling ``checkpoint.pth`` (code/train.py:279-289) and reloads them with
``--resume`` / ``--partial-reload`` (code/train.py:265-277) and at test time
with a key-rename shim + ``skip_keys=['head']`` (code/test.py:40-53,
code/utils/__init__.py:230-245).

This module provides:

- ``flax_to_torch_state`` / ``torch_to_flax_state``: bidirectional key+layout
  mapping between this framework's flax variables and the reference's torch
  ``state_dict`` names (``encoder.model.layer1.0.conv1.weight`` etc.), so
  checkpoints round-trip between frameworks.
- ``partial_load``: reference partial_load semantics (filter by key presence
  and substring skip list, report skipped/loaded).
- ``save_checkpoint`` / ``load_checkpoint``: the train-driver round trip.

Notes:
- torch (CPU) is used for .pth serialization when available; plain pickle is
  the fallback writer (readable by this framework, not by stock torch).
- Optimizer state in .pth files written here is this framework's native optax
  pytree (resume within the framework is exact). Importing a *reference*
  checkpoint restores model weights only — torch Adam state is keyed by
  opaque parameter indices; matching the reference's practical flows
  (test.py / --partial-reload), which also reload model weights only.
"""

from __future__ import annotations

import pickle
from typing import Any, Mapping

import numpy as np

try:
    import torch

    _HAVE_TORCH = True
except Exception:  # pragma: no cover - torch is baked into this image
    _HAVE_TORCH = False


# --------------------------------------------------------------- key mapping

_LEAF_MAP = {
    # (collection, flax leaf) -> torch leaf
    ("params", "kernel"): "weight",
    ("params", "scale"): "weight",
    ("params", "bias"): "bias",
    ("batch_stats", "mean"): "running_mean",
    ("batch_stats", "var"): "running_var",
}

_MODULE_MAP = {
    # teacher-student tower names (see models/teacher_student.py) map onto
    # the reference's CRWTeacherStudent attribute names
    # (code/teacherstudent.py:316-321: encoder/selfsim_fc/teacher.*).
    "student_encoder": ("encoder",),
    "student_head": ("selfsim_fc",),
    "teacher_encoder": ("teacher", "encoder"),
    "teacher_head": ("teacher", "selfsim_fc"),
    "head": ("selfsim_fc",),
    "downsample_conv": ("downsample", "0"),
    "downsample_bn": ("downsample", "1"),
}


def _module_path_to_torch(parts: tuple[str, ...]) -> tuple[str, ...]:
    out: list[str] = []
    for p in parts:
        if p in _MODULE_MAP:
            out.extend(_MODULE_MAP[p])
        elif p.startswith("layer") and "_" in p:
            stage, blk = p.split("_")
            out.extend((stage, blk))
        elif p.startswith("fc") and p[2:].isdigit():
            # Head fc{k} -> Sequential index 2k (ReLU between Linears,
            # code/model.py:47-56).
            out.append(str(2 * int(p[2:])))
        else:
            out.append(p)
    return tuple(out)


def _to_torch_array(leaf: np.ndarray, flax_leaf_name: str) -> np.ndarray:
    arr = np.asarray(leaf)
    if flax_leaf_name == "kernel":
        if arr.ndim == 4:      # conv HWIO -> OIHW
            return arr.transpose(3, 2, 0, 1)
        if arr.ndim == 2:      # dense (in, out) -> (out, in)
            return arr.T
    return arr


def _from_torch_array(arr: np.ndarray, flax_leaf_name: str,
                      target_shape: tuple) -> np.ndarray:
    arr = np.asarray(arr)
    if flax_leaf_name == "kernel":
        if arr.ndim == 4:      # OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:
            arr = arr.T
    if arr.shape != tuple(target_shape):
        raise ValueError(
            f"shape mismatch loading torch tensor: {arr.shape} vs {target_shape}")
    return arr


def _flatten(tree: Mapping, prefix=()) -> dict[tuple, Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: dict[tuple, Any]) -> dict:
    out: dict = {}
    for path, v in flat.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return out


def flax_to_torch_state(variables: Mapping) -> dict[str, np.ndarray]:
    """Flax CRW variables -> reference-named torch state_dict (numpy values).

    Emits ``num_batches_tracked`` zeros alongside each BN so stock torch
    ``load_state_dict`` of the reference model accepts the result.
    """
    state: dict[str, np.ndarray] = {}
    bn_prefixes = set()
    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        for path, leaf in _flatten(variables[collection]).items():
            *mods, leaf_name = path
            torch_leaf = _LEAF_MAP.get((collection, leaf_name))
            if torch_leaf is None:
                raise KeyError(f"unmapped flax leaf: {collection}/{path}")
            tpath = _module_path_to_torch(tuple(mods))
            key = ".".join(tpath + (torch_leaf,))
            state[key] = _to_torch_array(leaf, leaf_name)
            if collection == "batch_stats":
                bn_prefixes.add(".".join(tpath))
    for p in sorted(bn_prefixes):
        state[f"{p}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    return state


def _rename_shim(key: str) -> str:
    """Reference test-time rename: 'conv1.1.weight' -> 'conv1.weight'
    (checkpoints from an older Sequential(pad, conv) layout; code/test.py:44-50),
    plus DataParallel 'module.' prefix stripping."""
    if key.startswith("module."):
        key = key[len("module."):]
    for conv in ("conv1", "conv2"):
        key = key.replace(f"{conv}.1.weight", f"{conv}.weight")
    return key


def torch_to_flax_state(
    torch_state: Mapping[str, Any],
    variables: Mapping,
    skip_keys: tuple[str, ...] = (),
    verbose: bool = True,
) -> dict:
    """Load a reference-named state_dict into flax variables (partial_load).

    Semantics of code/utils/__init__.py:230-245: keep entries whose torch key
    exists in the target and contains no ``skip_keys`` substring; everything
    else is skipped (reported). Returns new variables.
    """
    torch_state = { _rename_shim(k): v for k, v in torch_state.items() }

    new_vars = {c: dict(_flatten(variables[c])) for c in variables}
    loaded, used_torch_keys = [], set()
    for collection in ("params", "batch_stats"):
        if collection not in new_vars:
            continue
        for path, leaf in list(new_vars[collection].items()):
            *mods, leaf_name = path
            torch_leaf = _LEAF_MAP.get((collection, leaf_name))
            if torch_leaf is None:
                continue
            key = ".".join(_module_path_to_torch(tuple(mods)) + (torch_leaf,))
            if key not in torch_state or any(sk in key for sk in skip_keys):
                continue
            val = torch_state[key]
            if _HAVE_TORCH and isinstance(val, torch.Tensor):
                val = val.detach().cpu().numpy()
            import jax.numpy as jnp
            new_vars[collection][path] = jnp.asarray(
                _from_torch_array(val, leaf_name, np.shape(leaf)))
            loaded.append(key)
            used_torch_keys.add(key)

    skipped = [k for k in torch_state
               if k not in used_torch_keys
               and not k.endswith("num_batches_tracked")]
    if verbose:
        print("\nSkipped keys: ", skipped)
        print("\nLoading keys: ", loaded)
    return {c: _unflatten(new_vars[c]) for c in new_vars}


def partial_load(torch_state, variables, skip_keys=(), verbose=True):
    """Alias matching the reference utility name (code/utils/__init__.py:230)."""
    return torch_to_flax_state(torch_state, variables, tuple(skip_keys), verbose)


# ------------------------------------------------------------- save / load


def _to_numpy_tree(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    variables: Mapping,
    optimizer_state: Any = None,
    lr_scheduler_state: Mapping | None = None,
    epoch: int = 0,
    args: Mapping | None = None,
) -> None:
    """Write a reference-format checkpoint dict to ``path`` (.pth).

    ``model`` is a reference-named torch state_dict so the file loads in the
    PyTorch reference; optimizer/lr_scheduler/args ride along as in
    code/train.py:281-287.
    """
    ckpt = {
        "model": flax_to_torch_state(variables),
        "optimizer": _to_numpy_tree(optimizer_state) if optimizer_state is not None else None,
        "lr_scheduler": dict(lr_scheduler_state or {}),
        "epoch": epoch,
        "args": dict(args or {}),
    }
    if _HAVE_TORCH:
        ckpt["model"] = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
                         if np.ndim(v) else torch.tensor(v)
                         for k, v in ckpt["model"].items()}
        torch.save(ckpt, path)
    else:  # pragma: no cover
        with open(path, "wb") as f:
            pickle.dump(ckpt, f)


def load_checkpoint(path: str) -> dict:
    """Read a .pth checkpoint (torch zipfile or pickle fallback)."""
    torch_err = None
    if _HAVE_TORCH:
        try:
            return torch.load(path, map_location="cpu", weights_only=False)
        except Exception as e:  # fall through to plain pickle
            torch_err = e
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception as e:
        if torch_err is not None:
            # surface the torch diagnosis (e.g. a truncated zip), not
            # pickle's misleading "invalid load key, 'PK'"
            raise torch_err from e
        raise


# ----------------------------------------------------- orbax native format


def save_checkpoint_orbax(directory: str, state_pytree: Any,
                          metadata: Mapping | None = None) -> None:
    """Write the training state as a native orbax checkpoint.

    Production alternative to the reference-compatible ``.pth`` writer:
    orbax handles large sharded arrays, atomic renames, and async saves.
    ``metadata`` (epoch/args/schedule) rides along as a JSON sidecar.
    """
    import json
    import os

    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(directory, _to_numpy_tree(state_pytree), force=True)
    # ALWAYS write the sidecar (empty when no metadata), atomically: the
    # loader treats a missing sidecar as an interrupted save — without
    # that, a crash right here would leave a valid-looking checkpoint that
    # silently resumes at epoch 0 with epoch-N weights
    meta_path = os.path.join(directory, "metadata.json")
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dict(metadata) if metadata is not None else {}, f)
    os.replace(tmp, meta_path)


def load_checkpoint_orbax(directory: str,
                          item: Any = None) -> tuple[Any, dict]:
    """Read an orbax checkpoint; returns (state_pytree, metadata).

    ``item``: optional template pytree. When given, orbax restores INTO that
    structure (named tuples, optax states) instead of raw nested dicts/lists
    — this is what makes ``--resume <orbax_dir>`` lossless for optimizer
    state, unlike the .pth shim's numpy-tree round trip.
    """
    import json
    import os

    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(directory, item=item) if item is not None \
        else ckptr.restore(directory)
    meta_path = os.path.join(directory, "metadata.json")
    if not os.path.exists(meta_path):
        raise RuntimeError(
            f"{directory} has checkpoint arrays but no metadata.json — the "
            f"save was interrupted between the array write and the sidecar "
            f"(resuming would silently restart at epoch 0 with these "
            f"weights); re-save the checkpoint")
    with open(meta_path) as f:
        meta = json.load(f)
    return tree, meta
