"""LSTM / MHA parity vs torch.nn golden modules."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

torch.manual_seed(0)

from dg_sct_tpu.ops import mha as M
from dg_sct_tpu.ops import rnn as R


def test_bilstm_matches_torch():
    in_dim, hidden, B, T = 12, 8, 3, 10
    tl = torch.nn.LSTM(in_dim, hidden, num_layers=1, batch_first=True, bidirectional=True)
    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    params = {
        "fwd": {"wi": jnp.asarray(sd["weight_ih_l0"].T), "wh": jnp.asarray(sd["weight_hh_l0"].T),
                "bi": jnp.asarray(sd["bias_ih_l0"]), "bh": jnp.asarray(sd["bias_hh_l0"])},
        "bwd": {"wi": jnp.asarray(sd["weight_ih_l0_reverse"].T), "wh": jnp.asarray(sd["weight_hh_l0_reverse"].T),
                "bi": jnp.asarray(sd["bias_ih_l0_reverse"]), "bh": jnp.asarray(sd["bias_hh_l0_reverse"])},
    }
    x = np.random.RandomState(0).randn(B, T, in_dim).astype(np.float32)
    ours = np.asarray(R.bilstm(params, jnp.asarray(x)))
    with torch.no_grad():
        ref, _ = tl(torch.from_numpy(x))
    assert np.max(np.abs(ours - ref.numpy())) < 5e-5


def test_lstm_unidirectional_matches_torch():
    in_dim, hidden, B, T = 6, 5, 2, 7
    tl = torch.nn.LSTM(in_dim, hidden, num_layers=1, batch_first=True)
    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    params = {"wi": jnp.asarray(sd["weight_ih_l0"].T), "wh": jnp.asarray(sd["weight_hh_l0"].T),
              "bi": jnp.asarray(sd["bias_ih_l0"]), "bh": jnp.asarray(sd["bias_hh_l0"])}
    x = np.random.RandomState(1).randn(B, T, in_dim).astype(np.float32)
    ours = np.asarray(R.lstm(params, jnp.asarray(x)))
    with torch.no_grad():
        ref, _ = tl(torch.from_numpy(x))
    assert np.max(np.abs(ours - ref.numpy())) < 5e-5


def test_mha_matches_torch():
    E, heads, Tq, Tk, B = 16, 4, 5, 7, 3
    tm = torch.nn.MultiheadAttention(E, heads, dropout=0.0)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {
        "in_proj": {"kernel": jnp.asarray(sd["in_proj_weight"].T),
                    "bias": jnp.asarray(sd["in_proj_bias"])},
        "out_proj": {"kernel": jnp.asarray(sd["out_proj.weight"].T),
                     "bias": jnp.asarray(sd["out_proj.bias"])},
    }
    rng = np.random.RandomState(2)
    q = rng.randn(Tq, B, E).astype(np.float32)
    k = rng.randn(Tk, B, E).astype(np.float32)
    v = rng.randn(Tk, B, E).astype(np.float32)
    ours = np.asarray(M.mha(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=heads))
    with torch.no_grad():
        ref, _ = tm(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    assert np.max(np.abs(ours - ref.numpy())) < 5e-5
