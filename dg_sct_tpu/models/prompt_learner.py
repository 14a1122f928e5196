"""Prompt learning for the pretrain/few-shot/zero-shot suite.

Rebuild of `pretrain/nets/prompt_learner.py:23-325`: CoOp learnable context
vectors (init from "a photo of a"), CoCoOp-style `meta_net` (kept for
checkpoint parity; the reference's forward never uses it —
prompt_learner.py:219-230), class_token_position end/middle/front, plus the
`ClipAdapter` bottleneck and the CLAP text-feature path.

Host-side prompt construction happens once at model build (tokenization +
frozen token embeddings); only `ctx` is a trainable leaf.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import CLIPConfig, PromptConfig
from ..ops import bpe
from ..ops.basic import linear, linear_init


def init_clip_adapter(key, c_in, reduction=4, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"fc1": {"kernel": jax.random.normal(k1, (c_in, c_in // reduction), dtype) * 0.02},
            "fc2": {"kernel": jax.random.normal(k2, (c_in // reduction, c_in), dtype) * 0.02}}


def clip_adapter(params, x):
    h = jax.nn.relu(x @ params["fc1"]["kernel"])
    return jax.nn.relu(h @ params["fc2"]["kernel"])


def build_prompt_buffers(classnames: Sequence[str], token_embedding: np.ndarray,
                         pcfg: PromptConfig, ccfg: CLIPConfig):
    """Host-side: tokenize `<ctx_init> <classname>.` prompts and split the
    frozen embeddings into prefix (SOS) / suffix (class+EOS) buffers.

    Returns dict with numpy arrays: ctx_init (n_ctx, w), token_prefix
    (n_cls, 1, w), token_suffix (n_cls, 77-1-n_ctx, w), tokenized (n_cls, 77),
    name_lens.
    """
    names = [n.replace("_", " ") for n in classnames]
    if not pcfg.weak:
        names = list(names) + ["background"]
    ctx_init = pcfg.ctx_init.replace("_", " ")
    n_ctx = len(ctx_init.split(" ")) if ctx_init else pcfg.n_ctx

    if ctx_init:
        init_tok = bpe.tokenize(ctx_init)[0]
        ctx_vectors = token_embedding[init_tok[1:1 + n_ctx]]
    else:
        ctx_vectors = 0.02 * np.random.RandomState(0).randn(n_ctx, ccfg.text_width)
    prompt_prefix = " ".join(["X"] * n_ctx) if not ctx_init else ctx_init

    tok = bpe.get_tokenizer()
    name_lens = [len(tok.encode(n)) for n in names]
    prompts = [f"{prompt_prefix} {n}." for n in names]
    tokenized = bpe.tokenize(prompts)                        # (n_cls, 77)
    embedding = token_embedding[tokenized]                   # (n_cls, 77, w)
    return {
        "ctx_init": np.asarray(ctx_vectors, np.float32),
        "token_prefix": embedding[:, :1].astype(np.float32),
        "token_suffix": embedding[:, 1 + n_ctx:].astype(np.float32),
        "tokenized": tokenized,
        "name_lens": name_lens,
        "n_ctx": n_ctx,
    }


def init_prompt_learner(key, buffers, vis_dim, ctx_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "ctx": jnp.asarray(buffers["ctx_init"], dtype),
        # CoCoOp meta_net: in the reference's ckpt but unused in forward
        "meta_net": {"linear1": linear_init(k1, vis_dim, vis_dim // 16, dtype=dtype),
                     "linear2": linear_init(k2, vis_dim // 16, ctx_dim, dtype=dtype)},
    }


def build_prompts(params, buffers, *, class_token_position="end"):
    """Assemble (n_cls, 77, width) prompt embeddings with the learned ctx."""
    prefix = jnp.asarray(buffers["token_prefix"])
    suffix = jnp.asarray(buffers["token_suffix"])
    n_cls = prefix.shape[0]
    n_ctx = buffers["n_ctx"]
    ctx = jnp.broadcast_to(params["ctx"][None], (n_cls,) + params["ctx"].shape)

    if class_token_position == "end":
        return jnp.concatenate([prefix, ctx, suffix], axis=1)

    rows = []
    for i in range(n_cls):
        nl = buffers["name_lens"][i]
        cls_i = suffix[i:i + 1, :nl]
        rest = suffix[i:i + 1, nl:]
        if class_token_position == "middle":
            half = n_ctx // 2
            row = jnp.concatenate([prefix[i:i + 1], ctx[i:i + 1, :half], cls_i,
                                   ctx[i:i + 1, half:], rest], axis=1)
        elif class_token_position == "front":
            row = jnp.concatenate([prefix[i:i + 1], cls_i, ctx[i:i + 1], rest], axis=1)
        else:
            raise ValueError(class_token_position)
        rows.append(row)
    return jnp.concatenate(rows, axis=0)
