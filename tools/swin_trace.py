import sys; sys.path.insert(0, "/root/repo")
import os; os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/torchok_tpu_jax_cache")
import functools
import jax, jax.numpy as jnp, numpy as np
from bench import build_trainer

trainer, task = build_trainer("swinv2_tiny_window8_256", 256, 256)
step = trainer._make_train_step(task, trainer.tx)
rng = np.random.default_rng(0)
host = {"image": rng.normal(size=(256,256,256,3)).astype(np.float32),
        "target": rng.integers(0, 1000, size=(256,)).astype(np.int64)}
batch = jax.device_put(host, trainer.data_sharding)
batch = {**batch, "image": batch["image"].astype(task.compute_dtype)}

@functools.partial(jax.jit, donate_argnums=(0,))
def multi(state, batch):
    def body(s, _):
        s2, _o, l = step(s, batch)
        return s2, l["loss"]
    return jax.lax.scan(body, state, None, length=5)

state = trainer.state
state, l = multi(state, batch); jax.block_until_ready(l)
with jax.profiler.trace("/tmp/swin_trace"):
    state, l = multi(state, batch)
    jax.block_until_ready(l)
print("trace done")
