"""Checkpoint save/load.

The reference saves bare `state_dict` files keyed by metric
(`main_trans.py:294-298`) and never persists optimizer/scheduler/RNG state
(SURVEY.md §5). We improve on that: `save_train_state` persists params, model
state (BN stats), optimizer state and the RNG key together so training resumes
bit-exactly — while `save_params`/`load_params` keep the lightweight
params-only flow for eval.

Format: a single `.npz` of path-flattened arrays ("a/b/0/c" keys). Portable,
dependency-free, and mmap-friendly for fast cold starts.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, tree) -> None:
    """Atomic write (tmp + rename): a preemption mid-save never corrupts an
    existing checkpoint — the pod-slice analogue of the reference's
    best-ckpt overwrite (main_trans.py:298), which is not crash-safe."""
    flat = _flatten(jax.device_get(tree))
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_params(path: str):
    with np.load(path, allow_pickle=False) as z:
        return _unflatten({k: z[k] for k in z.files})


def save_train_state(path: str, *, params, state, opt_state, rng_key, step: int,
                     metadata: dict | None = None) -> None:
    bundle = {
        "params": params,
        "state": state,
        "opt_state": jax.tree_util.tree_map(np.asarray, jax.device_get(opt_state)),
        "rng_key": jax.device_get(rng_key),
        "step": np.asarray(step),
    }
    save_params(path, {"bundle": bundle})
    if metadata:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f)


def load_params_and_state(path: str):
    """Load (params, state-or-None) from either a params-only file
    (`save_params`) or a full train-state bundle (`save_train_state`)."""
    tree = load_params(path)
    if "bundle" in tree:
        return tree["bundle"]["params"], tree["bundle"]["state"]
    if "params" in tree:
        return tree["params"], tree.get("state")
    return tree, None


def load_train_state(path: str, opt_state_template=None):
    """`opt_state_template` (e.g. `tx.init(params)`) restores optax's
    namedtuple structure, which the npz roundtrip flattens to lists."""
    tree = load_params(path)["bundle"]
    opt_state = tree["opt_state"]
    if opt_state_template is not None:
        opt_state = restore_structure(opt_state_template, opt_state)
    return tree["params"], tree["state"], opt_state, tree["rng_key"], int(tree["step"])


def restore_structure(template, loaded):
    """Re-hang loaded leaves on the template's treedef (positional)."""
    leaves = jax.tree_util.tree_leaves(loaded)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore_matching(template, loaded):
    """Path-aware partial restore: copy a loaded leaf only when the same path
    exists in the template with the same shape; keep the template's value
    otherwise. The analogue of the reference's skip-mismatched-keys loads
    (`zero-shot/zero_shot.py:92-93` drops prompt prefix/suffix buffers when
    the eval class list differs from the pretrain one; few-shot likewise).
    Returns (merged_tree, skipped_paths)."""
    flat_l = _flatten(jax.device_get(loaded))
    flat_t = _flatten(jax.device_get(template))
    skipped = []
    out = dict(flat_t)
    for k, v in flat_l.items():
        if k in flat_t and np.shape(flat_t[k]) == np.shape(v):
            out[k] = v
        else:
            skipped.append(k)
    return _unflatten(out), skipped
