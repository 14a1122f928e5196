"""Device mesh + sharding helpers.

The reference's entire parallelism story is single-GPU / `nn.DataParallel`
(SURVEY.md §2.8). The TPU-native replacement: a 1-D data mesh over ICI with
params replicated and the (clips x frames) batch axis sharded; XLA inserts the
gradient psums. The mesh is an explicit argument everywhere so task heads and
the interleave loop stay sharding-annotated rather than hard-coded replicated.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if num_devices is not None and len(devs) < num_devices:
        # fall back to the virtual CPU mesh (xla_force_host_platform_device_count)
        # when the default platform has fewer devices than requested
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) > len(devs):
            devs = cpu
    if num_devices is not None:
        if len(devs) < num_devices:
            raise RuntimeError(
                f"make_mesh({num_devices}): only {len(devs)} devices visible. "
                "For a virtual multi-device CPU mesh, set JAX_PLATFORMS=cpu and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={num_devices} "
                "BEFORE jax initializes (see tests/conftest.py), or run via "
                "__graft_entry__.dryrun_multichip which subprocesses with the "
                "right env.")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_data_mesh_for(batch_size: int, axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over the largest device count that divides `batch_size`
    (uneven batch sharding is rejected by GSPMD)."""
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n, axis)


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a host batch pytree with the leading axis sharded."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def constrain_batch(x, mesh: Mesh, axis: str = DATA_AXIS):
    """`with_sharding_constraint` pinning the leading axis to the data axis —
    used at tower boundaries inside jit so XLA keeps activations sharded."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


# ---------------------------------------------------------------------------
# 2-D (data x model) mesh: tensor-parallel parameter sharding for scale-out
# beyond pure data parallelism. The reference has nothing comparable
# (SURVEY.md §2.8); at DG-SCT's size TP is optional, but the framework exposes
# it so larger backbones drop in: annotate the params, let GSPMD insert the
# collectives.
# ---------------------------------------------------------------------------

MODEL_AXIS = "model"


def make_mesh_2d(data: int, model: int) -> Mesh:
    devs = jax.devices()
    if len(devs) < data * model:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) > len(devs):
            devs = cpu
    if len(devs) < data * model:
        raise RuntimeError(f"make_mesh_2d({data},{model}): only {len(devs)} devices")
    return Mesh(np.asarray(devs[: data * model]).reshape(data, model),
                (DATA_AXIS, MODEL_AXIS))


def tp_param_spec(path, leaf, model_size: int):
    """Megatron-style sharding rule for a param leaf over the model axis;
    everything not matched is replicated, and a rule only applies when the
    relevant dim divides the model axis.

      * MLP: fc1 column-split (+ fc1 bias), fc2 row-split — the all-reduce
        lands after fc2, where GSPMD inserts it;
      * window attention: qkv column-split, proj row-split — the pair brackets
        the attention the same way (one all-reduce after proj);
      * adapter bottleneck (grouped 1x1 convs, kernel (g, in/g, out/g)):
        group-axis split — block-diagonal, so the split is fully local.
    """
    keys = [p.key for p in path if hasattr(p, "key")]
    if leaf.ndim == 2 and "mlp" in keys and "kernel" in keys:
        if "fc1" in keys and leaf.shape[1] % model_size == 0:
            return P(None, MODEL_AXIS)            # column parallel
        if "fc2" in keys and leaf.shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)            # row parallel
    if leaf.ndim == 1 and "mlp" in keys and "fc1" in keys and "bias" in keys \
            and leaf.shape[0] % model_size == 0:
        return P(MODEL_AXIS)
    if leaf.ndim == 2 and "kernel" in keys:
        if "qkv" in keys and leaf.shape[1] % model_size == 0:
            return P(None, MODEL_AXIS)            # column parallel (q|k|v cols)
        if "proj" in keys and "attn" in keys and leaf.shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)            # row parallel
    if leaf.ndim == 3 and "kernel" in keys and ("down" in keys or "up" in keys) \
            and leaf.shape[0] % model_size == 0:
        return P(MODEL_AXIS, None, None)          # adapter grouped-conv groups
    return P()


# ---------------------------------------------------------------------------
# Sequence parallelism over the frame/time axis. DG-SCT's towers and adapters
# are frame-local (every block mixes tokens *within* a frame; cross-modal
# adapters couple the audio/visual streams of the SAME frame) — temporal
# mixing happens only in the task heads (TemporalAttention / BiLSTM over T).
# So sharding the (B, T, ...) batch as P(data, seq) keeps the entire
# interleaved encoder collective-free, and GSPMD inserts exactly one
# all-gather along `seq` where the head consumes the full clip. This is the
# long-clip scale-out path (T frames per clip; AVE T=10): batch parallelism
# caps at B, seq parallelism rides the frame axis within a clip.
# ---------------------------------------------------------------------------

SEQ_AXIS = "seq"


def make_mesh_2d_seq(data: int, seq: int) -> Mesh:
    devs = jax.devices()
    if len(devs) < data * seq:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) > len(devs):
            devs = cpu
    if len(devs) < data * seq:
        raise RuntimeError(f"make_mesh_2d_seq({data},{seq}): only {len(devs)}")
    return Mesh(np.asarray(devs[: data * seq]).reshape(data, seq),
                (DATA_AXIS, SEQ_AXIS))


def shard_batch_seq(batch, mesh: Mesh):
    """Device-put a host batch with (B, T, ...) leaves sharded P(data, seq);
    1-D leaves (labels per clip etc.) shard P(data) only."""
    def put(x):
        spec = (P(DATA_AXIS, SEQ_AXIS, *([None] * (x.ndim - 2)))
                if x.ndim >= 2 else P(DATA_AXIS))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def tp_shard_params(params, mesh: Mesh):
    """Device-put a param tree with Megatron TP sharding over the mesh's
    model axis (data axis left for the batch)."""
    model_size = mesh.shape[MODEL_AXIS]

    def put(path, leaf):
        spec = tp_param_spec(path, leaf, model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
