"""CLAP text branch — `pretrain/nets/prompt_learner.py:76-106` equivalent.

Pipeline (CLAPTextEncoder.forward): tokenize "The sounds of <name>" (RoBERTa
BPE, max_len 77) -> RoBERTa-base text_branch -> pooler_output -> CLAP
`text_projection` MLP (Linear 768->512, ReLU, Linear 512->512). The reference
loads all weights from the `630k-audioset-fusion-best.pt` CLAP checkpoint
(key prefixes `text_branch.`, `text_projection.`; a `text_transform` MLP is
loaded but unused by the forward — prompt_learner.py:91-92,100-106).

This module runs host-side at model-build time (the features are a static
buffer). Architecture comes from `transformers.RobertaModel` with an offline-
constructible `RobertaConfig` — so shapes/structure are exact today; weights
come from `load_clap_text_state` when the checkpoint exists, deterministic
random init otherwise. Tokenization uses the real RobertaTokenizer when its
assets are present, else a documented byte-level fallback (placeholder until
the BPE assets ship with the checkpoint).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

PROMPT = "The sounds of "
MAX_LEN = 77
ROBERTA_HIDDEN = 768
CLAP_EMBED = 512


def split_clap_text_state(state_dict: Dict[str, "object"]):
    """Split a CLAP checkpoint state dict into the three text component dicts,
    stripping prefixes exactly like prompt_learner.py:90,92,98
    (`k[12:]` for `text_branch.`, `k[15:]` for `text_transform.`,
    `k[16:]` for `text_projection.`)."""
    def strip(prefix):
        n = len(prefix)
        return {k[n:]: v for k, v in state_dict.items() if k.startswith(prefix)}

    return (strip("text_branch."), strip("text_transform."),
            strip("text_projection."))


def _build_roberta(text_branch_state=None, seed: int = 0):
    import torch
    from transformers import RobertaConfig, RobertaModel

    cfg = RobertaConfig()  # roberta-base dims: 12 layers, 768 hidden, 50265 vocab
    torch.manual_seed(seed)
    model = RobertaModel(cfg)
    if text_branch_state is not None:
        model.load_state_dict({k: torch.as_tensor(np.asarray(v))
                               for k, v in text_branch_state.items()},
                              strict=False)
    return model.eval()


def _build_projection(text_projection_state=None, seed: int = 0):
    import torch

    torch.manual_seed(seed + 1)
    proj = torch.nn.Sequential(
        torch.nn.Linear(ROBERTA_HIDDEN, CLAP_EMBED),
        torch.nn.ReLU(),
        torch.nn.Linear(CLAP_EMBED, CLAP_EMBED),
    )
    if text_projection_state is not None:
        proj.load_state_dict({k: torch.as_tensor(np.asarray(v))
                              for k, v in text_projection_state.items()})
    return proj.eval()


def _tokenize(texts: Sequence[str], vocab_size: int):
    """RobertaTokenizer when its BPE assets are on disk; otherwise a
    deterministic byte-level fallback with RoBERTa special-token ids
    (<s>=0, </s>=2, <pad>=1) so masks/shapes are faithful."""
    try:
        from transformers import RobertaTokenizer
        tok = RobertaTokenizer.from_pretrained("roberta-base",
                                               local_files_only=True)
        out = tok(list(texts), padding="max_length", truncation=True,
                  max_length=MAX_LEN, return_tensors="np")
        return out["input_ids"], out["attention_mask"]
    except Exception:
        ids = np.ones((len(texts), MAX_LEN), np.int64)      # <pad>=1
        mask = np.zeros((len(texts), MAX_LEN), np.int64)
        for i, t in enumerate(texts):
            body = [3 + (b % (vocab_size - 4)) for b in t.encode("utf-8")]
            seq = [0] + body[: MAX_LEN - 2] + [2]           # <s> ... </s>
            ids[i, : len(seq)] = seq
            mask[i, : len(seq)] = 1
        return ids, mask


def compute_clap_text_features(classnames, *, weak=True,
                               clap_state_dict: Optional[dict] = None,
                               seed: int = 0) -> np.ndarray:
    """(n_cls[+1], 512) CLAP text features for `clap_matching`
    (net_trans.py:788-795). `weak=False` appends a 'background' class
    (prompt_learner.py:81-83). Pass the raw CLAP checkpoint state dict via
    `clap_state_dict` to run with real weights."""
    import torch

    names = list(classnames) + ([] if weak else ["background"])
    branch_state = proj_state = None
    if clap_state_dict is not None:
        branch_state, _, proj_state = split_clap_text_state(clap_state_dict)
    model = _build_roberta(branch_state, seed)
    proj = _build_projection(proj_state, seed)
    ids, mask = _tokenize([PROMPT + n for n in names], model.config.vocab_size)
    with torch.no_grad():
        pooled = model(input_ids=torch.from_numpy(ids),
                       attention_mask=torch.from_numpy(mask))["pooler_output"]
        feats = proj(pooled)
    return feats.numpy().astype(np.float32)
