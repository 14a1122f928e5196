"""GPipe pipeline parallelism (parallel/pipeline.py) on the virtual 8-device
CPU mesh: exact parity vs the sequential stage loop, on a synthetic stack and
on real Swin-V2 stage-2 block pairs (the uniform repeated structure the full
model's pipeline placement targets)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_sct_tpu.parallel import pipeline as PP
from dg_sct_tpu.parallel.mesh import make_mesh


def _mlp_stage_params(key, n_stages, d, hidden):
    ks = jax.random.split(key, 2 * n_stages)
    return [{"w1": jax.random.normal(ks[2 * i], (d, hidden)) * 0.1,
             "w2": jax.random.normal(ks[2 * i + 1], (hidden, d)) * 0.1}
            for i in range(n_stages)]


def _mlp_body(p, x):
    return x + jnp.tanh(x @ p["w1"]) @ p["w2"]


@pytest.mark.parametrize("pipe,n_stages,n_micro", [(8, 8, 5), (4, 8, 3)])
def test_gpipe_matches_sequential_synthetic(pipe, n_stages, n_micro):
    d, hidden, mb = 16, 32, 4
    stages = _mlp_stage_params(jax.random.PRNGKey(0), n_stages, d, hidden)
    xs = jax.random.normal(jax.random.PRNGKey(1), (n_micro, mb, d))

    # sequential reference
    ref = []
    for m in range(n_micro):
        x = xs[m]
        for p in stages:
            x = _mlp_body(p, x)
        ref.append(x)
    ref = jnp.stack(ref)

    mesh = make_mesh(pipe, axis=PP.PIPE_AXIS)
    out = PP.gpipe(_mlp_body, PP.stack_stages(stages), xs, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_pytree_state_carry():
    """Pipelined state may be a pytree (the model's (f_v, f_a) pair)."""
    n_stages, n_micro, d = 4, 3, 8
    stages = _mlp_stage_params(jax.random.PRNGKey(2), n_stages, d, d)

    def body(p, x):
        a, b = x
        a = a + jnp.tanh(a @ p["w1"]) @ p["w2"]
        return (a, b + 0.5 * a)

    xs = (jax.random.normal(jax.random.PRNGKey(3), (n_micro, 2, d)),
          jax.random.normal(jax.random.PRNGKey(4), (n_micro, 2, d)))
    ref_a, ref_b = [], []
    for m in range(n_micro):
        x = (xs[0][m], xs[1][m])
        for p in stages:
            x = body(p, x)
        ref_a.append(x[0])
        ref_b.append(x[1])

    mesh = make_mesh(4, axis=PP.PIPE_AXIS)
    out = PP.gpipe(body, PP.stack_stages(stages), xs, mesh)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(jnp.stack(ref_a)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(jnp.stack(ref_b)),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_swin_stage2_pairs_match():
    """Pipeline real Swin-V2 stage-2 block pairs (shift-0 + shifted — the
    uniform repeated unit `interleave._detect_scan_pairs` certifies) over a
    4-deep pipe and compare against the sequential block loop."""
    from dg_sct_tpu.configs import SwinV2Config
    from dg_sct_tpu.models import swinv2 as S

    cfg = SwinV2Config(img_size=64, patch_size=4, embed_dim=16,
                       depths=(1, 1, 8, 1), num_heads=(2, 2, 2, 2),
                       window_size=4, drop_path_rate=0.0)
    params = S.init_swinv2(jax.random.PRNGKey(5), cfg)
    plan = S.block_plan(cfg)[2]
    blocks = params["layers"][2]["blocks"]
    meta0, meta1 = plan[0], plan[1]  # shift 0 / shifted, uniform across pairs
    assert all(p["shift"] == (meta0["shift"] if i % 2 == 0 else meta1["shift"])
               for i, p in enumerate(plan))

    B, L, D = 2, meta0["res"][0] * meta0["res"][1], meta0["dim"]
    n_micro = 3
    xs = jax.random.normal(jax.random.PRNGKey(6), (n_micro, B, L, D)) * 0.5

    ref = []
    for m in range(n_micro):
        x = xs[m]
        for i, bp in enumerate(blocks):
            x = S.block(bp, x, plan[i], train=False)
        ref.append(x)
    ref = jnp.stack(ref)

    stacked = {"b0": PP.stack_stages(blocks[0::2]),
               "b1": PP.stack_stages(blocks[1::2])}

    def pair_body(p, x):
        x = S.block(p["b0"], x, meta0, train=False)
        return S.block(p["b1"], x, meta1, train=False)

    mesh = make_mesh(4, axis=PP.PIPE_AXIS)
    out = PP.gpipe(pair_body, stacked, xs, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gpipe_rejects_indivisible_stages():
    stages = _mlp_stage_params(jax.random.PRNGKey(7), 6, 4, 4)
    xs = jnp.zeros((2, 1, 4))
    mesh = make_mesh(4, axis=PP.PIPE_AXIS)
    with pytest.raises(ValueError):
        PP.gpipe(_mlp_body, PP.stack_stages(stages), xs, mesh)


def test_gpipe_gradients_match_sequential():
    """The pipeline is training-capable: jax.grad differentiates through the
    shard_map/ppermute schedule and matches the sequential loop's gradients."""
    n_stages, n_micro, d = 4, 3, 8
    stages = _mlp_stage_params(jax.random.PRNGKey(8), n_stages, d, d)
    stacked = PP.stack_stages(stages)
    xs = jax.random.normal(jax.random.PRNGKey(9), (n_micro, 2, d))
    mesh = make_mesh(4, axis=PP.PIPE_AXIS)

    def loss_pipe(stacked):
        return jnp.sum(PP.gpipe(_mlp_body, stacked, xs, mesh) ** 2)

    def loss_seq(stacked):
        def all_stages(x):
            def step(c, p):
                return _mlp_body(p, c), None
            x, _ = jax.lax.scan(step, x, stacked)
            return x
        return jnp.sum(jax.vmap(all_stages)(xs) ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-5),
        g_pipe, g_seq)


def test_interleave_pipelined_eval_matches():
    """Full-model integration: interleave.set_pipeline routes stage-2's
    repeated pairs through gpipe during eval; outputs (incl. the last-pair
    spatial pooling maps) match the unrolled forward."""
    from dg_sct_tpu.configs import (AVEModelConfig, AdapterConfig,
                                    AudioFrontendConfig, HTSATConfig,
                                    SwinV2Config)
    from dg_sct_tpu.models import ave, interleave

    frontend = AudioFrontendConfig(sample_rate=3200, clip_seconds=1, n_fft=256,
                                   hop_size=320, mel_bins=16, fmax=1500.0,
                                   spec_size=32, time_drop_width=8)
    swin = SwinV2Config(img_size=64, patch_size=4, embed_dim=16,
                        depths=(1, 1, 6, 1), num_heads=(2, 2, 2, 2),
                        window_size=4, drop_path_rate=0.0)
    htsat = HTSATConfig(spec_size=32, patch_size=4, embed_dim=8,
                        depths=(1, 1, 2, 1), num_heads=(2, 2, 2, 2),
                        window_size=4, drop_path_rate=0.0, frontend=frontend)
    cfg = AVEModelConfig(swin=swin, htsat=htsat,
                         adapter=AdapterConfig(reduction_factor=2, num_tokens=4),
                         num_frames=2)
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)

    B = 2
    rs = np.random.RandomState(0)
    wave = jnp.asarray(rs.randn(B, cfg.num_frames,
                                cfg.htsat.frontend.clip_samples).astype(np.float32))
    images = jnp.asarray(rs.rand(B, cfg.num_frames, 64, 64, 3).astype(np.float32))

    ref, _ = ave.forward(params, state, wave, images, cfg, train=False)

    mesh = make_mesh(2, axis=PP.PIPE_AXIS)
    interleave.set_pipeline(mesh, n_micro=2)
    try:
        out, _ = ave.forward(params, state, wave, images, cfg, train=False)
    finally:
        interleave.set_pipeline(None)

    np.testing.assert_allclose(np.asarray(out["event_scores"]),
                               np.asarray(ref["event_scores"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["is_event_scores"]),
                               np.asarray(ref["is_event_scores"]),
                               rtol=1e-4, atol=1e-4)
