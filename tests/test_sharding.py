"""Multi-device sharding tests on the virtual 8-device CPU mesh — the
TPU-native analogue of multi-node simulation (the reference never had this;
SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_sct_tpu.configs import TrainConfig
from dg_sct_tpu.models import ave
from dg_sct_tpu.parallel import mesh as M
from dg_sct_tpu.train import ave_train
from tests.test_ave_model import tiny_cfg


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_eval_matches_single_device():
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    tr, fr = ave_train.partition_params(params)
    estep = ave_train.make_eval_step(cfg)

    B = 8
    rs = np.random.RandomState(0)
    gt = np.zeros((B, cfg.num_frames, 29), np.float32)
    gt[:, :, 1] = 1.0
    batch = {
        "wave": jnp.asarray(rs.randn(B, cfg.num_frames, cfg.htsat.frontend.clip_samples).astype(np.float32)),
        "image": jnp.asarray(rs.rand(B, cfg.num_frames, 64, 64, 3).astype(np.float32)),
        "gt": jnp.asarray(gt),
    }
    single = estep(tr, fr, state, batch)

    m = M.make_mesh(8)
    tr_r, fr_r, state_r = (M.replicate(t, m) for t in (tr, fr, state))
    batch_s = M.shard_batch(batch, m)
    sharded = estep(tr_r, fr_r, state_r, batch_s)
    np.testing.assert_allclose(float(single["correct_frac"]),
                               float(sharded["correct_frac"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(single["outputs"]["event_scores"]),
                               np.asarray(sharded["outputs"]["event_scores"]),
                               atol=1e-4)


def test_sharded_train_step_runs():
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    tr, fr = ave_train.partition_params(params)
    tx = ave_train.make_optimizer(tr, TrainConfig(accum_steps=1), steps_per_epoch=10)
    opt_state = tx.init(tr)
    step = ave_train.make_train_step(cfg, tx, donate=False)

    m = M.make_mesh(8)
    B = 8
    rs = np.random.RandomState(1)
    gt = np.zeros((B, cfg.num_frames, 29), np.float32)
    gt[:, :, 2] = 1.0
    batch = M.shard_batch({
        "wave": jnp.asarray(rs.randn(B, cfg.num_frames, cfg.htsat.frontend.clip_samples).astype(np.float32)),
        "image": jnp.asarray(rs.rand(B, cfg.num_frames, 64, 64, 3).astype(np.float32)),
        "gt": jnp.asarray(gt),
    }, m)
    tr_r, fr_r, state_r = (M.replicate(t, m) for t in (tr, fr, state))
    opt_r = M.replicate(opt_state, m)
    tr2, state2, opt2, metrics = step(tr_r, fr_r, state_r, opt_r, batch,
                                      jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # updated trainable params stay replicated (no sharding leak)
    leaf = jax.tree_util.tree_leaves(tr2)[0]
    assert leaf.sharding.is_fully_replicated


def test_2d_mesh_tensor_parallel_eval_matches():
    """(4 data x 2 model) mesh: MLP weights Megatron-sharded over the model
    axis, batch over data; GSPMD inserts the collectives. Numerics match the
    single-device eval."""
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    tr, fr = ave_train.partition_params(params)
    estep = ave_train.make_eval_step(cfg)

    B = 8
    rs = np.random.RandomState(1)
    gt = np.zeros((B, cfg.num_frames, 29), np.float32)
    gt[:, :, 2] = 1.0
    batch = {
        "wave": jnp.asarray(rs.randn(B, cfg.num_frames, cfg.htsat.frontend.clip_samples).astype(np.float32)),
        "image": jnp.asarray(rs.rand(B, cfg.num_frames, 64, 64, 3).astype(np.float32)),
        "gt": jnp.asarray(gt),
    }
    single = estep(tr, fr, state, batch)

    m2 = M.make_mesh_2d(4, 2)
    # sanity: some leaves actually get model-sharded
    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: str(M.tp_param_spec(p, l, 2)), fr)
    assert any("model" in s for s in jax.tree_util.tree_leaves(specs))
    tr_s = M.tp_shard_params(tr, m2)
    fr_s = M.tp_shard_params(fr, m2)
    state_r = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.sharding.NamedSharding(
            m2, jax.sharding.PartitionSpec())), state)
    batch_s = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.sharding.NamedSharding(
            m2, jax.sharding.PartitionSpec("data"))), batch)
    sharded = estep(tr_s, fr_s, state_r, batch_s)
    np.testing.assert_allclose(np.asarray(single["outputs"]["event_scores"]),
                               np.asarray(sharded["outputs"]["event_scores"]),
                               atol=1e-4)


def test_tp_spec_covers_attention_and_adapters():
    """Round-2 TP sharded only the MLP; the rule now covers window-attention
    qkv (column) / proj (row) and the adapter grouped bottleneck convs."""
    cfg = tiny_cfg()
    params, _ = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: (tuple(k.key for k in p if hasattr(k, "key")),
                      str(M.tp_param_spec(p, l, 2))), params)
    flat = jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, tuple))
    def sharded(name):
        return any(name in keys and "model" in spec for keys, spec in flat)
    assert sharded("qkv"), "attention qkv not model-sharded"
    assert sharded("proj"), "attention proj not model-sharded"
    assert sharded("down") and sharded("up"), "adapter bottleneck not sharded"
    assert sharded("fc1") and sharded("fc2"), "mlp not sharded"


def test_2d_mesh_collectives_in_hlo():
    """The compiled HLO of the TP eval step must actually contain all-reduces
    over the model axis (GSPMD inserted them where the row-parallel halves
    end) — guards against a silently-replicated 'TP' path."""
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    tr, fr = ave_train.partition_params(params)

    B = 8
    rs = np.random.RandomState(1)
    gt = np.zeros((B, cfg.num_frames, 29), np.float32)
    gt[:, :, 2] = 1.0
    batch = {
        "wave": jnp.asarray(rs.randn(B, cfg.num_frames,
                                     cfg.htsat.frontend.clip_samples).astype(np.float32)),
        "image": jnp.asarray(rs.rand(B, cfg.num_frames, 64, 64, 3).astype(np.float32)),
        "gt": jnp.asarray(gt),
    }
    m2 = M.make_mesh_2d(4, 2)
    tr_s = M.tp_shard_params(tr, m2)
    fr_s = M.tp_shard_params(fr, m2)
    rep = jax.sharding.NamedSharding(m2, jax.sharding.PartitionSpec())
    state_r = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
    batch_s = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.sharding.NamedSharding(
            m2, jax.sharding.PartitionSpec("data"))), batch)

    def eval_fn(tr, fr, state, batch):
        out, _ = ave.forward(ave_train.merge_params(tr, fr), state,
                             batch["wave"], batch["image"], cfg, train=False)
        return out["event_scores"]

    compiled = jax.jit(eval_fn).lower(tr_s, fr_s, state_r, batch_s).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo or "all-gather" in hlo, \
        "no cross-device collectives in the TP program"
    # grad-free eval with row-parallel fc2/proj must produce partial-sum
    # all-reduces, not just batch-axis gathers
    assert "all-reduce" in hlo


def test_seq_parallel_eval_matches():
    """(4 data x 2 seq) mesh: the (B, T) batch sharded over BOTH clip and
    frame axes (mesh.shard_batch_seq). The towers/adapters are frame-local so
    the encoder stays collective-free; GSPMD all-gathers along `seq` only
    where the temporal head consumes the full clip. Numerics match the
    single-device eval."""
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    tr, fr = ave_train.partition_params(params)
    estep = ave_train.make_eval_step(cfg)

    B = 4
    assert cfg.num_frames % 2 == 0
    rs = np.random.RandomState(2)
    gt = np.zeros((B, cfg.num_frames, 29), np.float32)
    gt[:, :, 3] = 1.0
    batch = {
        "wave": jnp.asarray(rs.randn(B, cfg.num_frames, cfg.htsat.frontend.clip_samples).astype(np.float32)),
        "image": jnp.asarray(rs.rand(B, cfg.num_frames, 64, 64, 3).astype(np.float32)),
        "gt": jnp.asarray(gt),
    }
    single = estep(tr, fr, state, batch)

    m = M.make_mesh_2d_seq(4, 2)
    rep = jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec())
    tr_r, fr_r, state_r = (jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), t) for t in (tr, fr, state))
    batch_s = M.shard_batch_seq(batch, m)
    # the (B, T, ...) leaves must really be sharded over both axes
    assert batch_s["image"].sharding.spec[:2] == (M.DATA_AXIS, M.SEQ_AXIS)
    sharded = estep(tr_r, fr_r, state_r, batch_s)
    np.testing.assert_allclose(np.asarray(single["outputs"]["event_scores"]),
                               np.asarray(sharded["outputs"]["event_scores"]),
                               atol=1e-4)
