"""Shared deterministic tensor synthesis for the reference activation goldens.

The golden harness (tests/gen_reference_goldens.py -> tests/test_reference_golden.py)
proves numeric parity against the REFERENCE'S OWN torch modules
(net_trans.py:433-674,96-292, mgn.py:107-160, grouping.py:683-770,
net_avst.py:27-262, PVT_AVSModel.py:90-300) without committing megabytes of
weights: both sides regenerate every weight and input from `np.random.
RandomState` (bit-stable across numpy versions by spec), keyed by the tensor's
state-dict key.  The committed artifacts are only (a) the key->shape census and
(b) the reference outputs.
"""
from __future__ import annotations

import json
import os
import zlib

import numpy as np

GOLD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def synth(key: str, shape, *, is_input=False) -> np.ndarray:
    """Deterministic pseudo-random tensor for state-dict key `key`.

    Weight matrices get 1/sqrt(fan_in) scaling so activations stay O(1)
    through deep stacks (keeps sigmoids/softmaxes off their saturated flats,
    where a wrong implementation could still match).  BN running_var must be
    positive; num_batches_tracked stays integer zero.
    """
    shape = tuple(int(s) for s in shape)
    rs = np.random.RandomState(zlib.crc32(key.encode()) & 0x7FFFFFFF)
    if key.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if key.endswith("running_var"):
        return (0.5 + rs.rand(*shape)).astype(np.float32)
    if is_input:
        return (0.5 * rs.randn(*shape)).astype(np.float32)
    if len(shape) >= 2:
        fan_in = int(np.prod(shape[1:]))
        return (rs.randn(*shape) / np.sqrt(fan_in)).astype(np.float32)
    return (0.5 * rs.randn(*shape)).astype(np.float32)


def synth_tokens(key: str, shape, vocab: int) -> np.ndarray:
    rs = np.random.RandomState(zlib.crc32(key.encode()) & 0x7FFFFFFF)
    return rs.randint(0, vocab, size=tuple(shape)).astype(np.int64)


def rebuild_sd(census: dict) -> dict:
    """Reconstruct the exact numpy state dict the generator loaded into the
    reference module, from the committed key->shape census."""
    return {k: synth(k, v["shape"]) for k, v in census.items()}


def census_path(comp: str) -> str:
    return os.path.join(GOLD_DIR, f"refgold_{comp}_keys.json")


def outputs_path(comp: str) -> str:
    return os.path.join(GOLD_DIR, f"refgold_{comp}.npz")


def load_census(comp: str) -> dict:
    with open(census_path(comp)) as f:
        return json.load(f)


def save_component(comp: str, sd_shapes: dict, outputs: dict) -> None:
    with open(census_path(comp), "w") as f:
        json.dump(sd_shapes, f, indent=0, sort_keys=True)
    np.savez_compressed(outputs_path(comp),
                        **{k: np.asarray(v) for k, v in outputs.items()})
    n = sum(int(np.prod(v["shape"])) for v in sd_shapes.values())
    sizes = {k: list(np.asarray(v).shape) for k, v in outputs.items()}
    print(f"refgold_{comp}: {len(sd_shapes)} keys ({n / 1e6:.2f}M params), "
          f"outputs {sizes}")
