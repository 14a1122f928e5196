"""Checkpoint/resume: a saved train state must continue bit-exactly —
capability the reference never had (it saved bare state_dicts only,
SURVEY.md §5)."""
import numpy as np
import jax
import jax.numpy as jnp

from dg_sct_tpu.configs import TrainConfig
from dg_sct_tpu.models import ave
from dg_sct_tpu.train import ave_train
from dg_sct_tpu.utils import checkpoint as C
from tests.test_ave_model import tiny_cfg
from tests.test_train_step import make_batch


def test_train_resume_bit_exact(tmp_path):
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    tr, fr = ave_train.partition_params(params)
    tcfg = TrainConfig(accum_steps=1)
    tx = ave_train.make_optimizer(tr, tcfg, steps_per_epoch=10)
    opt_state = tx.init(tr)
    step = ave_train.make_train_step(cfg, tx, donate=False)
    rng = jax.random.PRNGKey(7)

    # run 1 step, save, run a 2nd step
    b0, b1 = make_batch(cfg), make_batch(cfg)
    tr1, state1, opt1, _ = step(tr, fr, state, opt_state, b0, jax.random.fold_in(rng, 0))
    path = str(tmp_path / "resume.npz")
    C.save_train_state(path, params=ave_train.merge_params(tr1, fr), state=state1,
                       opt_state=opt1, rng_key=rng, step=1)
    tr2a, state2a, opt2a, m_a = step(tr1, fr, state1, opt1, b1, jax.random.fold_in(rng, 1))

    # reload and repeat the 2nd step — identical result required
    params_l, state_l, opt_l, rng_l, step_n = C.load_train_state(
        path, opt_state_template=tx.init(tr))
    assert step_n == 1
    tr_l, fr_l = ave_train.partition_params(
        jax.tree_util.tree_map(jnp.asarray, params_l))
    state_l = jax.tree_util.tree_map(jnp.asarray, state_l)
    opt_l = jax.tree_util.tree_map(jnp.asarray, opt_l)
    tr2b, state2b, opt2b, m_b = step(tr_l, fr_l, state_l, opt_l, b1,
                                     jax.random.fold_in(jnp.asarray(rng_l), 1))

    np.testing.assert_array_equal(np.asarray(m_a["loss"]), np.asarray(m_b["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(tr2a), jax.tree_util.tree_leaves(tr2b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
