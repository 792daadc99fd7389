import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import numpy as np
import jax, jax.numpy as jnp
from hotformerloc_tpu.losses.losses import make_loss
from hotformerloc_tpu.models.config import oxford_config
from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc
from hotformerloc_tpu.training.optim import lr_schedule, make_optimizer
from hotformerloc_tpu.training.step import StepConfig, init_train_state, make_train_step

B = 32
cfg = oxford_config(grad_checkpoint=True)
model = HOTFormerLoc(cfg, dtype=jnp.bfloat16)
loss_fn = make_loss("truncatedsmoothap", positives_per_query=4)
sched = lr_schedule(5e-4, steps_per_epoch=100, epochs=150, warmup_epochs=5, milestones=[100])
tx = make_optimizer("adam", sched, weight_decay=1e-4)
rng = np.random.default_rng(0)
base = rng.uniform(-0.9, 0.9, (B // 2, cfg.num_points, 3)).astype(np.float32)
pts = np.repeat(base, 2, axis=0)
pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
groups = np.repeat(np.arange(B // 2), 2)
batch = {
    "points": jnp.asarray(pts),
    "pmask": jnp.ones((B, cfg.num_points), dtype=bool),
    "positives_mask": jnp.asarray((groups[:, None] == groups[None]) & ~np.eye(B, dtype=bool)),
    "negatives_mask": jnp.asarray(groups[:, None] != groups[None]),
}
state = init_train_state(model, tx, jax.random.PRNGKey(0), batch)
step = make_train_step(model, tx, loss_fn, StepConfig(accum_steps=4))
state, stats = step(state, batch, jax.random.PRNGKey(0))
jax.block_until_ready(stats["loss"])
state, stats = step(state, batch, jax.random.PRNGKey(1))
jax.block_until_ready(stats["loss"])
with jax.profiler.trace("/tmp/jtrace"):
    for i in range(5):
        state, stats = step(state, batch, jax.random.PRNGKey(i + 2))
    jax.block_until_ready(stats["loss"])
print("trace done")
