"""Cold-compile time of the SINGLE full-size train step (the driver path),
inner stage-2 scan on vs off."""
import sys; sys.path.insert(0, "/root/repo")
import os, time, json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["CC_DIR"])
from dg_sct_tpu.configs import AVEModelConfig, TrainConfig
from dg_sct_tpu.models import ave, interleave as I
from dg_sct_tpu.train import ave_train
from dg_sct_tpu.data import ave as ave_data

I.set_scan(os.environ.get("SCAN", "1") == "1")
cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
tpu = jax.devices()[0]
tr, fr = ave_train.partition_params(params)
tr, fr, state = (jax.device_put(t, tpu) for t in (tr, fr, state))
tx = ave_train.make_optimizer(tr, TrainConfig(accum_steps=1), steps_per_epoch=100)
opt_state = jax.device_put(tx.init(tr), tpu)
step = ave_train.make_train_step(cfg, tx, donate=False)
b = ave_data.synthetic_batch(4, seed=0)
b["mixup_lambda"] = np.random.RandomState(0).beta(0.5, 0.5, size=(40,)).astype(np.float32)
b = {k: jax.device_put(jnp.asarray(v), tpu) for k, v in b.items()}
t0 = time.perf_counter()
tr2, st2, opt2, m = step(tr, fr, state, opt_state, b, jax.random.PRNGKey(1))
loss = float(m["loss"])
print(json.dumps({"scan": os.environ.get("SCAN", "1"),
                  "compile_plus_first_step_s": round(time.perf_counter() - t0, 1),
                  "loss": round(loss, 3)}))
