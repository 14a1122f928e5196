"""Eval-time adapter folding (BN -> bottleneck kernels, gate -> ln_post) is
numerically exact on the full AVE forward."""
import jax
import jax.numpy as jnp
import numpy as np

from dg_sct_tpu.models import ave, interleave
from test_ave_model import tiny_cfg


def test_fold_adapters_eval_exact():
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    # make the folded pieces non-trivial: random BN stats/affines + gates
    rs = np.random.RandomState(0)

    def scramble(t, path=""):
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(rs.randn(*x.shape).astype(np.float32) * 0.3
                                  + (1.0 if x.ndim == 1 else 0.0))
            if x.dtype == jnp.float32 else x, t)

    for k in interleave.ADKEYS:
        for i, (ap, ast) in enumerate(zip(params["adapters"][k],
                                          state["adapters"][k])):
            for bn in ("bn1", "bn2"):
                if bn in ap:
                    ap[bn] = scramble(ap[bn])
                    ast[bn] = {"mean": jnp.asarray(
                        rs.randn(*ast[bn]["mean"].shape).astype(np.float32)),
                        "var": jnp.asarray(
                            0.5 + rs.rand(*ast[bn]["var"].shape).astype(np.float32)),
                        "count": ast[bn]["count"]}
            if "gate" in ap:
                ap["gate"] = jnp.asarray([0.7], jnp.float32)

    B = 2
    wave = jnp.asarray(rs.randn(B, cfg.num_frames,
                                cfg.htsat.frontend.clip_samples)
                       .astype(np.float32)) * 0.1
    imgs = jnp.asarray(rs.rand(B, cfg.num_frames, cfg.swin.img_size,
                               cfg.swin.img_size, 3).astype(np.float32))
    out0, _ = ave.forward(params, state, wave, imgs, cfg, train=False)
    fp, fs = interleave.fold_adapters_eval(params, state, cfg)
    # folding removed the bn/gate leaves
    assert "bn1" not in fp["adapters"]["a_p1"][0]
    assert "gate" not in fp["adapters"]["v_p1"][0]
    out1, _ = ave.forward(fp, fs, wave, imgs, cfg, train=False)
    for k in ("event_scores", "is_event_scores", "av_score"):
        np.testing.assert_allclose(np.asarray(out0[k]), np.asarray(out1[k]),
                                   rtol=2e-4, atol=2e-5)
