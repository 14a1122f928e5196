"""CLAP text branch — `pretrain/nets/prompt_learner.py:76-106` equivalent.

Pipeline (CLAPTextEncoder.forward): tokenize "The sounds of <name>" (RoBERTa
BPE, max_len 77) -> RoBERTa-base text_branch -> pooler_output -> CLAP
`text_projection` MLP (Linear 768->512, ReLU, Linear 512->512). The reference
loads all weights from the `630k-audioset-fusion-best.pt` CLAP checkpoint
(key prefixes `text_branch.`, `text_projection.`; a `text_transform` MLP is
loaded but unused by the forward — prompt_learner.py:91-92,100-106).

The encoder itself is the JAX-native RoBERTa in `models/roberta.py` (parity
vs `transformers.RobertaModel` in `tests/test_third_party_parity.py`), so the
text tower runs on-device like every other tower; weights come from the CLAP
checkpoint's `text_branch.*` keys when present, deterministic random init
otherwise. Tokenization uses the real RobertaTokenizer when its assets are
present, else a documented byte-level fallback (placeholder until the BPE
assets ship with the checkpoint).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from . import roberta as R

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
    `clap_state_dict` to run with real weights. Runs the JAX-native RoBERTa
    (`models/roberta.py`) — device-placed under the ambient jax config."""
    import jax

    names = list(classnames) + ([] if weak else ["background"])
    branch_state = proj_state = None
    if clap_state_dict is not None:
        branch_state, _, proj_state = split_clap_text_state(clap_state_dict)
    # partial checkpoints are tolerated (the torch path loaded strict=False):
    # any component absent from the dict falls back to deterministic init
    params = (R.roberta_from_torch(branch_state) if branch_state
              else R.init_roberta(jax.random.PRNGKey(seed)))
    proj = (R.projection_from_torch(proj_state) if proj_state
            else R.init_text_projection(jax.random.PRNGKey(seed + 1)))
    ids, mask = _tokenize([PROMPT + n for n in names], R.VOCAB)
    _, pooled = R.roberta_encode(params, ids.astype(np.int32),
                                 mask.astype(np.int32))
    feats = R.text_projection(proj, pooled)
    return np.asarray(feats, np.float32)
