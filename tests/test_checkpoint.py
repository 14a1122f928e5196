"""Checkpoint save/load roundtrip, incl. full train-state resume."""
import numpy as np
import jax
import jax.numpy as jnp

from dg_sct_tpu.utils import checkpoint as C


def test_params_roundtrip(tmp_path):
    tree = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "layers": [{"w": np.ones((4, 4), np.float32)},
                       {"w": np.zeros((4, 4), np.float32)}]}
    p = str(tmp_path / "ck.npz")
    C.save_params(p, tree)
    back = C.load_params(p)
    assert isinstance(back["layers"], list)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["layers"][1]["w"], tree["layers"][1]["w"])


def test_train_state_roundtrip(tmp_path):
    import optax
    params = {"w": jnp.ones((3, 3))}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    state = {"bn": {"mean": jnp.zeros(3), "var": jnp.ones(3)}}
    p = str(tmp_path / "train.npz")
    C.save_train_state(p, params=params, state=state, opt_state=opt_state,
                       rng_key=jax.random.PRNGKey(7), step=42,
                       metadata={"epoch": 3})
    params2, state2, opt2, rng2, step = C.load_train_state(
        p, opt_state_template=tx.init(params))
    assert step == 42
    np.testing.assert_array_equal(np.asarray(params2["w"]), np.ones((3, 3)))
    np.testing.assert_array_equal(np.asarray(rng2), np.asarray(jax.random.PRNGKey(7)))
    # restored opt_state must be structurally usable by tx.update
    grads = {"w": jnp.ones((3, 3))}
    opt2 = jax.tree_util.tree_map(jnp.asarray, opt2)
    updates, _ = tx.update(grads, opt2, params2)
    assert updates["w"].shape == (3, 3)


def test_restore_matching_partial():
    """Path-aware partial restore: same-shape paths copied, mismatched or
    missing paths keep the template (zero_shot.py:92-93 skip semantics)."""
    import numpy as np

    from dg_sct_tpu.utils import checkpoint as C

    template = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4), "d": np.zeros(5)},
                "lst": [np.zeros(2), np.zeros(2)]}
    loaded = {"a": np.ones((2, 3)),                       # shape match -> copy
              "b": {"c": np.ones(9)},                     # mismatch -> skip
              "extra": np.ones(7),                        # no template -> skip
              "lst": [np.full(2, 5.0), np.full(2, 6.0)]}  # list positions copy
    merged, skipped = C.restore_matching(template, loaded)
    np.testing.assert_array_equal(merged["a"], 1.0)
    np.testing.assert_array_equal(merged["b"]["c"], 0.0)
    np.testing.assert_array_equal(merged["b"]["d"], 0.0)
    np.testing.assert_array_equal(merged["lst"][0], 5.0)
    np.testing.assert_array_equal(merged["lst"][1], 6.0)
    assert sorted(skipped) == ["b/c", "extra"]


def test_snapshot_run(tmp_path):
    """Recorder-equivalent run snapshot: source copied, meta written."""
    import json
    import os

    from dg_sct_tpu.utils.metrics_log import snapshot_run

    code = snapshot_run(str(tmp_path), config={"lr": 1e-3})
    assert os.path.exists(os.path.join(code, "configs.py"))
    assert os.path.exists(os.path.join(code, "native", "io_core.cpp"))
    meta = json.load(open(tmp_path / "run_meta.json"))
    assert meta["config"]["lr"] == 1e-3
