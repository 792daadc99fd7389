import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import time, numpy as np
t0 = time.time()
import jax, jax.numpy as jnp
from hotformerloc_tpu.models.config import oxford_config
from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
print("import", round(time.time()-t0, 1), flush=True)

cfg = oxford_config(grad_checkpoint=False)
model = HOTFormerLoc(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
B = 2
pts = jnp.asarray(rng.uniform(-1, 1, (B, cfg.num_points, 3)).astype(np.float32))
pmask = jnp.ones((B, cfg.num_points), dtype=bool)
t0 = time.time()
params = jax.jit(lambda r: model.init(r, pts, pmask))(jax.random.PRNGKey(0))
jax.block_until_ready(params)
print("init(jit) done", round(time.time()-t0, 1), flush=True)

fn = jax.jit(lambda p, x, m: model.apply(p, x, m)["global"])
t0 = time.time()
lowered = fn.lower(params, pts, pmask)
print("trace+lower", round(time.time()-t0, 1), flush=True)
t0 = time.time()
compiled = lowered.compile()
print("compile", round(time.time()-t0, 1), flush=True)
t0 = time.time()
out = compiled(params, pts, pmask)
jax.block_until_ready(out)
print("run1", round(time.time()-t0, 3), flush=True)
t0 = time.time()
for _ in range(5):
    out = compiled(params, pts, pmask)
jax.block_until_ready(out)
print("run5", round((time.time()-t0)/5, 4), "s/fwd B=2", flush=True)
