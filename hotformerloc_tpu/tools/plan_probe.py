"""Sub-stage timing of octree plan construction on the real chip.

bisect_step measured build=7ms but build+plan=520ms per microbatch —
this probe splits the plan cost by level and by table kind
(neigh_table 27-tap search vs child_table scatter) to direct the fix.

Usage: python -m hotformerloc_tpu.tools.plan_probe
"""
from __future__ import annotations

import json
import time

import numpy as np


def _timeit(fn, args, iters=5):
    from hotformerloc_tpu.utils.profiling import fetch_sync
    out = fn(*args)
    fetch_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from hotformerloc_tpu.models.config import oxford_config
    from hotformerloc_tpu.octree.build import build_batched_octree
    from hotformerloc_tpu.octree.neigh import child_table, neigh_table

    cfg = oxford_config()
    B = 8
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (B, cfg.num_points, 3))
                      .astype(np.float32))
    msk = jnp.ones((B, cfg.num_points), dtype=bool)

    octree = jax.jit(lambda p, m: build_batched_octree(
        p, m, cfg.octree_depth, cfg.min_depth,
        cfg.resolve_capacities()))(pts, msk)
    octree = jax.tree_util.tree_map(
        lambda x: jax.device_put(x) if hasattr(x, "shape") else x, octree)

    from hotformerloc_tpu.ops.plan import build_plan

    f = jax.jit(lambda p, m: jax.tree_util.tree_leaves(build_plan(
        build_batched_octree(p, m, cfg.octree_depth, cfg.min_depth,
                             cfg.resolve_capacities()))))
    ms = _timeit(f, (pts, msk))
    print(json.dumps({"stage": "build+plan(full)", "ms": round(ms, 2)}),
          flush=True)

    for d in range(cfg.min_depth, cfg.octree_depth + 1):
        f = jax.jit(lambda o, dd=d: neigh_table(o, dd, "333"))
        ms = _timeit(f, (octree,))
        print(json.dumps({"stage": f"neigh_d{d}", "ms": round(ms, 2),
                          "cap": octree.cap(d)}), flush=True)
    for d in range(cfg.min_depth + 1, cfg.octree_depth + 1):
        f = jax.jit(lambda o, dd=d: child_table(o, dd))
        ms = _timeit(f, (octree,))
        print(json.dumps({"stage": f"child_d{d}", "ms": round(ms, 2),
                          "cap": octree.cap(d)}), flush=True)


if __name__ == "__main__":
    main()
