"""30 full-size AVE train steps on-chip: loss-curve sanity with the round-2
training fidelity (drop_path active, BN stats, mixup, SpecAug)."""
import sys; sys.path.insert(0, "/root/repo")
import json, time
import numpy as np
import jax, jax.numpy as jnp
import optax
jax.config.update("jax_compilation_cache_dir", "/tmp/dg_sct_tpu_jax_cache")
from dg_sct_tpu.configs import AVEModelConfig, TrainConfig
from dg_sct_tpu.models import ave
from dg_sct_tpu.train import ave_train, losses
from dg_sct_tpu.data import ave as ave_data

cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
tpu = jax.devices()[0]
tr, fr = ave_train.partition_params(params)
tr, fr, state = (jax.device_put(t, tpu) for t in (tr, fr, state))
tx = ave_train.make_optimizer(tr, TrainConfig(accum_steps=1), steps_per_epoch=100)
opt_state = jax.device_put(tx.init(tr), tpu)

M, B = 30, 4
stacked = {}
for i in range(M):
    b = ave_data.synthetic_batch(B, seed=i % 4)   # 4 recurring batches -> memorizable
    b["mixup_lambda"] = np.random.RandomState(i).beta(0.5, 0.5, size=(B * 10,)).astype(np.float32)
    for k, v in b.items():
        stacked.setdefault(k, []).append(v)
stacked = {k: jax.device_put(jnp.asarray(np.stack(v)), tpu) for k, v in stacked.items()}
rngs = jax.random.split(jax.random.PRNGKey(7), M)

@jax.jit
def train_stream(tr, fr, state, opt_state, batches, rngs):
    def body(carry, x):
        tr, state, opt_state = carry
        batch, rng = x
        def loss_fn(t, st):
            p = ave_train.merge_params(t, fr)
            out, new_state = ave.forward(p, st, batch["wave"], batch["image"],
                                         cfg, train=True, rng=rng,
                                         mixup_lambda=batch["mixup_lambda"])
            return losses.ave_loss(out, batch["gt"]), new_state
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(tr, state)
        updates, opt_state = tx.update(grads, opt_state, tr)
        tr = optax.apply_updates(tr, updates)
        return (tr, new_state, opt_state), loss
    _, ls = jax.lax.scan(body, (tr, state, opt_state), (batches, rngs))
    return ls

t0 = time.perf_counter()
ls = np.asarray(train_stream(tr, fr, state, opt_state, stacked, rngs))
print(json.dumps({"compile_plus_run_s": round(time.perf_counter() - t0, 1),
                  "losses": [round(float(x), 3) for x in ls]}))
assert np.isfinite(ls).all()
assert ls[-5:].mean() < ls[:5].mean(), "loss did not decrease"
print("loss decreased:", round(float(ls[:5].mean()), 3), "->", round(float(ls[-5:].mean()), 3))
