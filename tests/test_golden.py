"""Golden-output regression tests.

Freezes the tiny AVE model's outputs for a fixed seed/input. Any future
refactor that changes numerics (layout changes, fusion rewrites, dtype edits)
trips this test — the multi-round analogue of checkpoint-parity testing until
the real PyTorch checkpoints are available for conversion.

Regenerate (after an INTENDED change) with:
    python -m tests.test_golden regen
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from dg_sct_tpu.models import ave
from tests.test_ave_model import tiny_cfg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_ave.npz")


def _compute():
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    wave = jnp.asarray(rs.randn(2, cfg.num_frames, cfg.htsat.frontend.clip_samples).astype(np.float32))
    imgs = jnp.asarray(rs.rand(2, cfg.num_frames, 64, 64, 3).astype(np.float32))
    out, _ = ave.forward(params, state, wave, imgs, cfg, train=False)
    return {k: np.asarray(v) for k, v in out.items()}


def test_tiny_ave_outputs_frozen():
    if not os.path.exists(GOLDEN):
        import pytest
        pytest.skip("golden file missing — run `python -m tests.test_golden regen`")
    got = _compute()
    with np.load(GOLDEN) as z:
        for k in z.files:
            np.testing.assert_allclose(
                got[k], z[k], atol=2e-4, rtol=2e-3,
                err_msg=f"output '{k}' drifted from golden values")


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **_compute())
        print(f"wrote {GOLDEN}")
