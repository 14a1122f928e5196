"""Shape/semantics tests for the dormant-set rebuilds (SURVEY.md §2.7):
attention-variant library, legacy AVE modules, PHM/compacter layers, and the
alternate backbones. These components are dead code in the reference (zero
call sites) — covered here at interface level, with torch cross-checks where
the math is subtle (kronecker/PHM)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_sct_tpu.models import attentions as ATT
from dg_sct_tpu.models import legacy as L
from dg_sct_tpu.models import legacy_backbones as LB
from dg_sct_tpu.models import phm


KEY = jax.random.PRNGKey(0)


def test_scaled_dot_and_dot_product():
    q = jax.random.normal(KEY, (2, 5, 16))
    k = jax.random.normal(jax.random.fold_in(KEY, 1), (2, 7, 16))
    v = jax.random.normal(jax.random.fold_in(KEY, 2), (2, 7, 16))
    ctx, attn = ATT.scaled_dot_product_attention(q, k, v)
    assert ctx.shape == (2, 5, 16) and attn.shape == (2, 5, 7)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-5)
    ctx2, attn2 = ATT.dot_product_attention(q, k)
    assert ctx2.shape == (2, 5, 16)


def test_scaled_dot_matches_torch():
    import torch
    q = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
    kv = np.random.RandomState(1).randn(2, 7, 16).astype(np.float32)
    ctx, _ = ATT.scaled_dot_product_attention(jnp.asarray(q), jnp.asarray(kv),
                                              jnp.asarray(kv))
    score = torch.bmm(torch.tensor(q), torch.tensor(kv).transpose(1, 2)) / np.sqrt(16)
    ref = torch.bmm(torch.softmax(score, -1), torch.tensor(kv))
    np.testing.assert_allclose(np.asarray(ctx), ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("variant", ["additive", "location", "mh_location",
                                     "multi_head", "relative", "customizing"])
def test_attention_variants_shapes(variant):
    D, B, L_, H = 64, 2, 9, 4
    if variant == "additive":
        p = ATT.init_additive(KEY, D)
        ctx, attn = ATT.additive_attention(
            p, jax.random.normal(KEY, (B, L_, D)),
            jax.random.normal(KEY, (B, L_, D)), jax.random.normal(KEY, (B, L_, D)))
        assert ctx.shape == (B, 1, D) and attn.shape == (B, L_)
    elif variant == "location":
        p = ATT.init_location_aware(KEY, D)
        ctx, attn = ATT.location_aware_attention(
            p, jax.random.normal(KEY, (B, L_, D)), jax.random.normal(KEY, (B, L_, D)))
        assert ctx.shape == (B, D) and attn.shape == (B, L_)
        np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-5)
    elif variant == "mh_location":
        p = ATT.init_multi_head_location_aware(KEY, D, num_heads=H)
        ctx, attn = ATT.multi_head_location_aware_attention(
            p, jax.random.normal(KEY, (B, 1, D)), jax.random.normal(KEY, (B, L_, D)))
        assert ctx.shape == (B, 1, D) and attn.shape == (B, H, L_)
    elif variant == "multi_head":
        p = ATT.init_multi_head(KEY, D, H)
        x = jax.random.normal(KEY, (B, L_, D))
        ctx, attn = ATT.multi_head_attention(p, x, x, x)
        assert ctx.shape == (B, L_, D) and attn.shape == (B, H, L_, L_)
    elif variant == "relative":
        p = ATT.init_relative_multi_head(KEY, D, H)
        x = jax.random.normal(KEY, (B, L_, D))
        out = ATT.relative_multi_head_attention(p, x, x, x, x)
        assert out.shape == (B, L_, D)
    else:
        p = ATT.init_customizing(KEY, D, H)
        ctx, attn = ATT.customizing_attention(
            p, jax.random.normal(KEY, (B, 3, D)), jax.random.normal(KEY, (B, L_, D)))
        assert ctx.shape == (B, 3, D)


def test_rel_shift_realigns():
    # the transformer-XL shift: row q of the shifted matrix is the original
    # row q rotated so that column k holds score(q, relative offset k-q)
    x = jnp.arange(1 * 1 * 3 * 3, dtype=jnp.float32).reshape(1, 1, 3, 3)
    y = ATT._rel_shift(x)
    assert y.shape == x.shape
    import torch
    xt = torch.arange(9, dtype=torch.float32).reshape(1, 1, 3, 3)
    zeros = xt.new_zeros(1, 1, 3, 1)
    padded = torch.cat([zeros, xt], dim=-1).view(1, 1, 4, 3)
    ref = padded[:, :, 1:].view_as(xt)
    np.testing.assert_allclose(np.asarray(y), ref.numpy())


# --- legacy AVE modules -----------------------------------------------------

def test_cas_and_weak_localization():
    p = L.init_cas_module(KEY, 256)
    out = L.cas_module(p, jax.random.normal(KEY, (2, 10, 256)))
    assert out.shape == (2, 10, 29)
    p = L.init_weakly_localization(KEY, 256)
    is_ev, raw, ev = L.weakly_localization(p, jax.random.normal(KEY, (10, 2, 256)))
    assert is_ev.shape == (2, 10) and raw.shape == (2, 29) and ev.shape == (2, 29)
    np.testing.assert_allclose(np.asarray(ev.sum(-1)), 1.0, rtol=1e-5)


def test_audio_visual_contrastive():
    B, T = 2, 10
    p = L.init_audio_visual_contrastive(KEY)
    out = L.audio_visual_contrastive(
        p, jax.random.normal(KEY, (B * T, 36, 1536)),
        jax.random.normal(KEY, (B * T, 1, 768)),
        jax.nn.softmax(jax.random.normal(KEY, (B * T, 1, 36)), -1))
    assert out.shape == (B * B, T, 1)


def test_audio_visual_adapter():
    p = L.init_audio_visual_adapter(KEY)
    x, a = L.audio_visual_adapter(p, jax.random.normal(KEY, (20, 1536)),
                                  jax.random.normal(KEY, (20, 768)))
    assert x.shape == (20, 1536) and a.shape == (20, 768)


def test_new_audio_guided_attention():
    p = L.init_new_audio_guided_attention(KEY)
    out = L.new_audio_guided_attention(
        p, jax.random.normal(KEY, (2, 10, 7, 7, 512)),
        jax.random.normal(KEY, (10, 2, 128)))
    assert out.shape == (2, 10, 512)
    assert np.isfinite(np.asarray(out)).all()


# --- PHM / kronecker --------------------------------------------------------

def test_kronecker_matches_torch():
    import torch
    a = np.random.RandomState(0).randn(3, 2, 4).astype(np.float32)
    b = np.random.RandomState(1).randn(3, 5, 6).astype(np.float32)
    ours = phm.kronecker_product_einsum_batched(jnp.asarray(a), jnp.asarray(b))
    ref = torch.stack([torch.kron(torch.tensor(ai), torch.tensor(bi))
                       for ai, bi in zip(a, b)])
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)
    ours2 = phm.kronecker_product(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(ours2), ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("factorized", [False, True])
def test_phm_linear_matches_explicit_kron(factorized):
    """y must equal x @ (sum_i rule_i ⊗ W_i) + b — the reference's
    matvec_product (my_layers.py:11-35) materialized explicitly."""
    p = phm.init_phm_linear(KEY, 8, 12, 4, factorized_phm=factorized,
                            factorized_phm_rule=factorized, phm_rank=2,
                            w_init="glorot-uniform")
    x = jax.random.normal(KEY, (5, 8))
    y = phm.phm_linear(p, x)
    assert y.shape == (5, 12)
    W = (jnp.einsum("ipr,irl->ipl", p["W_left"], p["W_right"])
         if factorized else p["W"])
    rule = (jnp.einsum("ijr,irk->ijk", p["phm_rule_left"], p["phm_rule_right"])
            if factorized else p["phm_rule"])
    H = phm.kronecker_product_einsum_batched(rule, W).sum(0)
    ref = x @ H + p["b"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


# --- alternate backbones ----------------------------------------------------

def test_ast_forward():
    p = LB.init_ast(KEY, fstride=16, tstride=16, input_fdim=64, input_tdim=64,
                    embed_dim=32, depth=2, num_heads=4)
    out = LB.ast_forward(p, jax.random.normal(KEY, (2, 64, 64)), num_heads=4)
    assert out.shape == (2, 32)
    out = LB.ast_forward(p, jax.random.normal(KEY, (2, 64, 64)), num_heads=4,
                         apply_head=True)
    assert out.shape == (2, 527)


def test_ast_pos_embed_adapt():
    pe = jax.random.normal(KEY, (2 + 24 * 24, 16))
    small = LB.adapt_pos_embed(pe, 24, 12, 8)
    assert small.shape == (2 + 12 * 8, 16)
    big = LB.adapt_pos_embed(pe, 24, 12, 101)
    assert big.shape == (2 + 12 * 101, 16)
    # shrink = centre crop: token rows must appear verbatim
    grid = pe[2:].reshape(24, 24, 16)
    np.testing.assert_allclose(np.asarray(small[2:].reshape(12, 8, 16)),
                               np.asarray(grid[6:18, 8:16]))


def test_modified_resnet():
    p, st = LB.init_modified_resnet(KEY, layers=(1, 1, 1, 1), output_dim=64,
                                    heads=8, input_resolution=64, width=16)
    out, new_st = LB.modified_resnet(p, st, jax.random.normal(KEY, (2, 64, 64, 3)))
    assert out.shape == (2, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_avenet():
    p, st = LB.init_avenet(KEY)
    out, new_st = LB.avenet(p, st, jax.random.normal(KEY, (2, 64, 96)),
                            train=True)
    assert out.shape == (2, 309)
    # train pass must update running BN stats
    assert int(new_st["bn1"]["count"]) == 1
