"""lax.scan over repeated stage-2 block groups: numerics identical to the
unrolled loop (eval AND train, incl. drop_path rng and adapter BN states)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_sct_tpu.configs import AVEModelConfig, AdapterConfig
from dg_sct_tpu.models import ave, interleave as I
from tests.test_ave_model import tiny_cfg


def scan_cfg(dpr=0.0):
    base = tiny_cfg()
    swin = dataclasses.replace(base.swin, depths=(1, 1, 6, 1),
                               drop_path_rate=dpr)
    htsat = dataclasses.replace(base.htsat, depths=(1, 1, 2, 1),
                                drop_path_rate=dpr)
    return AVEModelConfig(swin=swin, htsat=htsat, adapter=base.adapter,
                          num_frames=2)


@pytest.mark.parametrize("train,dpr", [(False, 0.0), (True, 0.4)])
def test_scan_matches_unrolled(train, dpr):
    cfg = scan_cfg(dpr)
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    N = 2
    wave = jnp.asarray(rs.randn(N, cfg.htsat.frontend.clip_samples).astype(np.float32))
    imgs = jnp.asarray(rs.rand(N, 64, 64, 3).astype(np.float32))
    rng = jax.random.PRNGKey(3) if train else None

    try:
        I.set_scan(False)
        ref, ref_state = I.forward(params, state, wave, imgs, cfg, train=train,
                                   rng=rng)
        I.set_scan(True, min_pairs=1)
        out, out_state = I.forward(params, state, wave, imgs, cfg, train=train,
                                   rng=rng)
    finally:
        I.set_scan(False, min_pairs=2)

    for k in ("f_v", "f_a"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5, rtol=1e-5)
    # adapter BN running stats flow identically through the scanned stage
    r_leaves = jax.tree_util.tree_leaves(ref_state)
    o_leaves = jax.tree_util.tree_leaves(out_state)
    assert len(r_leaves) == len(o_leaves)
    for a, b in zip(r_leaves, o_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
