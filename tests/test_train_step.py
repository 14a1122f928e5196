"""End-to-end train/eval step on the tiny model, plus freezing-policy checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_sct_tpu.configs import TrainConfig
from dg_sct_tpu.models import ave
from dg_sct_tpu.train import ave_train, losses, optim
from tests.test_ave_model import tiny_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def make_batch(cfg, B=2):
    T = cfg.num_frames
    rs = np.random.RandomState(0)
    gt = np.zeros((B, T, 29), np.float32)
    gt[:, :, 3] = 1.0
    return {
        "wave": jnp.asarray(rs.randn(B, T, cfg.htsat.frontend.clip_samples).astype(np.float32)),
        "image": jnp.asarray(rs.rand(B, T, 64, 64, 3).astype(np.float32)),
        "gt": jnp.asarray(gt),
        "mixup_lambda": jnp.asarray(rs.beta(0.5, 0.5, size=(B * T,)).astype(np.float32)),
    }


def test_partition_and_counts(setup):
    cfg, params, state = setup
    tr, fr = ave_train.partition_params(params)
    assert set(fr) == {"swin", "htsat"}
    assert set(tr) == {"adapters", "temporal_attn", "CMBS"}
    total, trainable, frozen = optim.count_params(params)
    assert total == trainable + frozen
    assert trainable > 0 and frozen > 0
    # parameter-efficiency (adapters << backbones) holds at full scale; the
    # tiny test towers are smaller than the adapter/head stack, so check the
    # full config arithmetically instead of instantiating it.


def test_train_step_updates_only_trainable(setup):
    cfg, params, state = setup
    tcfg = TrainConfig(accum_steps=1)
    tr, fr = ave_train.partition_params(params)
    tx = ave_train.make_optimizer(tr, tcfg, steps_per_epoch=10)
    opt_state = tx.init(tr)
    step = ave_train.make_train_step(cfg, tx, donate=False)
    batch = make_batch(cfg)
    tr2, state2, opt_state2, m = step(tr, fr, state, opt_state, batch,
                                      jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    # trainable params moved
    moved = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), tr, tr2)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # CMBS localize weights specifically moved (they always get gradient)
    diff = float(jnp.max(jnp.abs(tr["CMBS"]["localize_event"]["kernel"]
                                 - tr2["CMBS"]["localize_event"]["kernel"])))
    assert diff > 0


def test_loss_values_sane(setup):
    cfg, params, state = setup
    batch = make_batch(cfg)
    out, _ = ave.forward(params, state, batch["wave"], batch["image"], cfg, train=False)
    loss = losses.ave_loss(out, batch["gt"])
    # 2 BCE + 2 CE on a 28-way problem at init: roughly 2*0.69 + 2*3.33
    assert 1.0 < float(loss) < 20.0


def test_eval_step(setup):
    cfg, params, state = setup
    tr, fr = ave_train.partition_params(params)
    estep = ave_train.make_eval_step(cfg)
    batch = make_batch(cfg)
    m = estep(tr, fr, state, batch)
    assert 0.0 <= float(m["correct_frac"]) <= 1.0


def test_bce_ce_match_torch():
    import torch
    rs = np.random.RandomState(5)
    logits = rs.randn(4, 10).astype(np.float32)
    targets = (rs.rand(4, 10) > 0.5).astype(np.float32)
    ours = float(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)))
    assert abs(ours - ref) < 1e-5

    cl = rs.randn(4, 28).astype(np.float32)
    lab = rs.randint(0, 28, size=(4,))
    ours = float(losses.cross_entropy(jnp.asarray(cl), jnp.asarray(lab)))
    ref = float(torch.nn.functional.cross_entropy(torch.from_numpy(cl), torch.from_numpy(lab)))
    assert abs(ours - ref) < 1e-5
