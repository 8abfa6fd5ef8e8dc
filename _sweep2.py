import time
import numpy as np, jax, jax.numpy as jnp
from pmpu_tpu.inference.engine import VolumeEvaluator
from pmpu_tpu.train.tasks import make_task
rng = np.random.default_rng(0)
S=128
vol = rng.random((S,S,S)).astype(np.float32)
task = make_task("probunet", dtype=jnp.bfloat16)
variables = task.init_variables(jax.random.key(0), jnp.zeros((2,S,S,1)), jnp.zeros((2,S,S,1),jnp.int32))
for eb in (192, 384):
    ev = VolumeEvaluator(task, n_samples=5, eval_batch=eb)
    r = ev.evaluate_volume(variables, vol, key=jax.random.key(0))
    jax.block_until_ready(r["fused"])
    ts=[]
    for i in range(3):
        t0=time.perf_counter()
        r = ev.evaluate_volume(variables, vol, key=jax.random.key(i))
        jax.block_until_ready(r["fused"]); _=r["argmax"]
        ts.append(time.perf_counter()-t0)
    print(f"eval_batch={eb:4d}: {np.median(ts):.3f}s/volume", flush=True)
