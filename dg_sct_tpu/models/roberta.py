"""JAX-native RoBERTa-base encoder — the CLAP text tower, on-device.

Round-2 ran the CLAP text branch host-side through torch
`transformers.RobertaModel` (`models/clap_text.py`); this module is the
TPU-native replacement: pure-function RoBERTa (BERT post-LN encoder with
RoBERTa's pad-offset position ids) + the CLAP text_projection MLP, jittable
end-to-end, with a converter from the reference checkpoint's HF-format state
dict. Reference: `pretrain/nets/prompt_learner.py:76-106` (text_branch ->
pooler -> text_projection); parity vs `transformers.RobertaModel` in
`tests/test_third_party_parity.py`.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import layer_norm, layer_norm_init, linear, linear_init

VOCAB = 50265
HIDDEN = 768
LAYERS = 12
HEADS = 12
INTERMEDIATE = 3072
MAX_POS = 514
PAD_ID = 1
LN_EPS = 1e-5


def init_roberta(key, *, vocab=VOCAB, hidden=HIDDEN, layers=LAYERS,
                 intermediate=INTERMEDIATE, max_pos=MAX_POS,
                 dtype=jnp.float32):
    ks = jax.random.split(key, layers + 5)
    emb_std = 0.02
    p = {
        "word_emb": jax.random.normal(ks[0], (vocab, hidden), dtype) * emb_std,
        "pos_emb": jax.random.normal(ks[1], (max_pos, hidden), dtype) * emb_std,
        "type_emb": jax.random.normal(ks[2], (1, hidden), dtype) * emb_std,
        "emb_ln": layer_norm_init(hidden, dtype),
        "pooler": linear_init(ks[3], hidden, hidden, dtype=dtype),
        "layers": [],
    }
    for i in range(layers):
        kk = jax.random.split(ks[4 + i], 6)
        p["layers"].append({
            "q": linear_init(kk[0], hidden, hidden, dtype=dtype),
            "k": linear_init(kk[1], hidden, hidden, dtype=dtype),
            "v": linear_init(kk[2], hidden, hidden, dtype=dtype),
            "attn_out": linear_init(kk[3], hidden, hidden, dtype=dtype),
            "attn_ln": layer_norm_init(hidden, dtype),
            "inter": linear_init(kk[4], hidden, intermediate, dtype=dtype),
            "out": linear_init(kk[5], intermediate, hidden, dtype=dtype),
            "out_ln": layer_norm_init(hidden, dtype),
        })
    return p


def _t(v):
    return jnp.asarray(np.asarray(v), jnp.float32)


def roberta_from_torch(state: Dict[str, "object"]):
    """Convert an HF `RobertaModel` state dict (the reference checkpoint's
    `text_branch.*` keys after prefix-strip) into the params pytree. Torch
    Linear weights are (out, in) — transposed here."""
    def lin(prefix):
        return {"w": _t(state[prefix + ".weight"]).T,
                "b": _t(state[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": _t(state[prefix + ".weight"]),
                "bias": _t(state[prefix + ".bias"])}

    p = {"word_emb": _t(state["embeddings.word_embeddings.weight"]),
         "pos_emb": _t(state["embeddings.position_embeddings.weight"]),
         "type_emb": _t(state["embeddings.token_type_embeddings.weight"]),
         "emb_ln": ln("embeddings.LayerNorm"),
         "pooler": lin("pooler.dense"),
         "layers": []}
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in state:
        b = f"encoder.layer.{i}"
        p["layers"].append({
            "q": lin(f"{b}.attention.self.query"),
            "k": lin(f"{b}.attention.self.key"),
            "v": lin(f"{b}.attention.self.value"),
            "attn_out": lin(f"{b}.attention.output.dense"),
            "attn_ln": ln(f"{b}.attention.output.LayerNorm"),
            "inter": lin(f"{b}.intermediate.dense"),
            "out": lin(f"{b}.output.dense"),
            "out_ln": ln(f"{b}.output.LayerNorm"),
        })
        i += 1
    return p


def _lin(p, x):
    # converter stores {"w","b"}; init_roberta stores linear_init's layout
    if "w" in p:
        return x @ p["w"] + p["b"]
    return linear(p, x)


def roberta_encode(params, input_ids, attention_mask, *, heads=HEADS):
    """input_ids/attention_mask: (B, L) int32. Returns (last_hidden (B, L, H),
    pooled (B, H)). Matches `transformers.RobertaModel` eval forward:
    position ids offset past the pad index (modeling_roberta
    create_position_ids_from_input_ids), post-LN encoder, tanh pooler."""
    mask = attention_mask.astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    pos_ids = incremental + PAD_ID

    h = (params["word_emb"][input_ids] + params["pos_emb"][pos_ids]
         + params["type_emb"][0])
    h = layer_norm(params["emb_ln"], h, eps=LN_EPS)

    B, L, H = h.shape
    d = H // heads
    bias = (1.0 - mask.astype(h.dtype))[:, None, None, :] * -1e9  # (B,1,1,L)

    for lp in params["layers"]:
        def split(p):
            return _lin(p, h).reshape(B, L, heads, d).transpose(0, 2, 1, 3)

        q, k, v = split(lp["q"]), split(lp["k"]), split(lp["v"])
        score = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d) + bias
        attn = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
        h = layer_norm(lp["attn_ln"], h + _lin(lp["attn_out"], ctx), eps=LN_EPS)
        ffn = _lin(lp["out"], jax.nn.gelu(_lin(lp["inter"], h), approximate=False))
        h = layer_norm(lp["out_ln"], h + ffn, eps=LN_EPS)

    pooled = jnp.tanh(_lin(params["pooler"], h[:, 0]))
    return h, pooled


def init_text_projection(key, hidden=HIDDEN, embed=512, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, hidden, embed, dtype=dtype),
            "fc2": linear_init(k2, embed, embed, dtype=dtype)}


def projection_from_torch(state: Dict[str, "object"]):
    """CLAP text_projection Sequential(Linear, ReLU, Linear): keys '0.*','2.*'."""
    return {"fc1": {"w": _t(state["0.weight"]).T, "b": _t(state["0.bias"])},
            "fc2": {"w": _t(state["2.weight"]).T, "b": _t(state["2.bias"])}}


def text_projection(params, pooled):
    return _lin(params["fc2"], jax.nn.relu(_lin(params["fc1"], pooled)))
