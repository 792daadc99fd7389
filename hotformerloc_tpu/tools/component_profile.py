"""Per-component on-chip wall-clock budget of the Oxford train step.

The step is NOT dominated by one op: bisect_step r4 measured fwd 353 ms
/ grad 2300 ms at microbatch 8, spread across ~44 sub-ops (34 CPEs, 34
window attentions, 10 RTSA, stem, pooling, plan). This tool times each
component family at its exact microbatch shape, fwd and fwd+bwd, so
optimisation targets are chosen by measurement (SURVEY.md §5 —
profiling discipline). One process, serial experiments (the tunnelled
chip admits one client; remote compiles are slow, so each experiment is
a small program).

Experiments (--exp, comma list or 'all'):
  band      banded Pallas dwconv/conv kernels (ops/pallas/band_conv.py)
            vs the flat gather path: correctness ON CHIP + timing
  cpe       flat dwconv fwd / fwd+bwd at hosa0 + octf shapes
  dense     dense voxel-grid CPE fwd / fwd+bwd (depth 5, the 32^3 grid)
  rtsa      relay-token attention block shape
  pool      PyramidAttnPool head
  noremat   full grad at microbatch 8 WITHOUT per-block remat: if it
            fits HBM, the remat re-forward (~350 ms/mb) is pure waste
            because the Pallas attention bwd already recomputes
            flash-style

Writes docs/COMPONENT_PROFILE.json (merged across invocations).
Run: python -m hotformerloc_tpu.tools.component_profile --exp band,cpe
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

RESULTS_PATH = "docs/COMPONENT_PROFILE.json"


def _time(fn, *args, iters: int = 20) -> float:
    import jax
    from hotformerloc_tpu.utils.profiling import fetch_sync
    out = fn(*args)
    fetch_sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch_sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def _record(results, name, **kw):
    results[name] = {k: (round(v, 4) if isinstance(v, float) else v)
                     for k, v in kw.items()}
    print(json.dumps({name: results[name]}), flush=True)


def real_level(B=8, num_points=4096, depth_use=6):
    """Real (neigh, N) from an on-device Oxford plan."""
    import jax.numpy as jnp
    from hotformerloc_tpu.models.config import oxford_config
    from hotformerloc_tpu.octree.build import build_batched_octree
    from hotformerloc_tpu.ops.plan import build_plan

    cfg = oxford_config()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 0.9, (B, num_points, 3)).astype(np.float32)
    octree = build_batched_octree(jnp.asarray(pts),
                                  jnp.ones((B, num_points), bool),
                                  cfg.octree_depth, cfg.min_depth,
                                  cfg.resolve_capacities())
    plan = build_plan(octree)
    return np.asarray(plan.neighs[octree.level(depth_use)])


def exp_band(results):
    import jax
    import jax.numpy as jnp
    from hotformerloc_tpu.ops.conv import _dwconv_fwd_impl, octree_dwconv, \
        octree_conv, _conv_fwd_impl
    from hotformerloc_tpu.ops.pallas import band_conv as bc

    neigh = real_level()
    B, N, K = neigh.shape
    rng = np.random.default_rng(1)

    for S, HR in ((128, 128), (64, 128)):
        nj = jnp.asarray(neigh)
        bt = jax.jit(lambda n: bc.build_band_tables(n, S, HR))(nj)
        hard = float((np.asarray(bt.hard_pos) >= 0).mean())
        ovf = int(np.asarray(bt.overflow).sum())
        loc = jax.jit(lambda n: bc._band_loc(n, S, HR))(nj)
        for C in (256, 128):
            x = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
            w = jnp.asarray(rng.normal(0, 0.2, (27, C)), jnp.bfloat16)
            tag = f"S{S}_HR{HR}_C{C}"
            try:
                f_band = jax.jit(
                    lambda x, l, w: bc.banded_dwconv(x, l, w, bt, False))
                out = np.asarray(f_band(x, loc, w), np.float32)
                ref = np.asarray(_dwconv_fwd_impl(x, nj, w), np.float32)
                md = float(np.abs(out - ref).max())
                ms = _time(f_band, x, loc, w)
                _record(results, f"band_dw_fwd_{tag}", ms=ms, maxdiff=md,
                        hard_frac=hard, overflow=ovf)
            except Exception as e:  # record Mosaic failures, keep going
                _record(results, f"band_dw_fwd_{tag}", error=str(e)[:200])
                continue

            def loss_band(x, w):
                return jnp.sum(
                    bc.banded_dwconv(x, loc, w, bt, False)
                    .astype(jnp.float32) ** 2)

            def loss_flat(x, w):
                return jnp.sum(
                    octree_dwconv(x, nj, w).astype(jnp.float32) ** 2)

            try:
                gb = jax.jit(jax.grad(loss_band, argnums=(0, 1)))
                gf = jax.jit(jax.grad(loss_flat, argnums=(0, 1)))
                bb = gb(x, w)
                ff = gf(x, w)
                md = max(float(np.abs(np.asarray(a, np.float32) -
                                      np.asarray(b, np.float32)).max())
                         for a, b in zip(bb, ff))
                _record(results, f"band_dw_bwd_{tag}",
                        ms=_time(gb, x, w), flat_ms=_time(gf, x, w),
                        maxdiff=md)
            except Exception as e:
                _record(results, f"band_dw_bwd_{tag}", error=str(e)[:200])

    # flat dwconv baselines
    nj = jnp.asarray(neigh)
    for C in (256, 128):
        x = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.2, (27, C)), jnp.bfloat16)
        f = jax.jit(_dwconv_fwd_impl)
        _record(results, f"flat_dw_fwd_C{C}", ms=_time(f, x, nj, w))

    # full conv (stem proj shape: depth 7, 128->128)
    S, HR, C, O = 64, 256, 128, 128
    bt = jax.jit(lambda n: bc.build_band_tables(n, S, HR))(nj)
    loc = jax.jit(lambda n: bc._band_loc(n, S, HR))(nj)
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.1, (27, C, O)), jnp.bfloat16)
    b2 = jnp.zeros((O,), jnp.bfloat16)
    try:
        f_band = jax.jit(
            lambda x, l, w: bc.banded_conv(x, l, w, b2, bt, False))
        out = np.asarray(f_band(x, loc, w2), np.float32)
        ref = np.asarray(_conv_fwd_impl(x, nj, w2, b2), np.float32)
        _record(results, "band_conv_fwd_C128_O128",
                ms=_time(f_band, x, loc, w2),
                flat_ms=_time(jax.jit(_conv_fwd_impl), x, nj, w2, b2),
                maxdiff=float(np.abs(out - ref).max()))
    except Exception as e:
        _record(results, "band_conv_fwd_C128_O128", error=str(e)[:200])


def exp_cpe(results):
    import jax
    import jax.numpy as jnp
    from hotformerloc_tpu.ops.conv import _dwconv_fwd_impl, octree_dwconv

    neigh = real_level()
    nj = jnp.asarray(neigh)
    B, N, K = neigh.shape
    rng = np.random.default_rng(2)
    for C in (256, 128):
        x = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.2, (27, C)), jnp.bfloat16)

        def loss(x, w):
            return jnp.sum(octree_dwconv(x, nj, w).astype(jnp.float32) ** 2)

        _record(results, f"cpe_flat_fwd_C{C}",
                ms=_time(jax.jit(_dwconv_fwd_impl), x, nj, w))
        _record(results, f"cpe_flat_fwdbwd_C{C}",
                ms=_time(jax.jit(jax.grad(loss, argnums=(0, 1))), x, w))


def exp_dense(results):
    import jax
    import jax.numpy as jnp
    from hotformerloc_tpu.models.config import oxford_config
    from hotformerloc_tpu.octree.build import build_batched_octree
    from hotformerloc_tpu.ops.conv import octree_dwconv_dense

    cfg = oxford_config()
    B = 8
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 0.9, (B, cfg.num_points, 3)).astype(np.float32)
    octree = build_batched_octree(jnp.asarray(pts),
                                  jnp.ones((B, cfg.num_points), bool),
                                  cfg.octree_depth, cfg.min_depth,
                                  cfg.resolve_capacities())
    for d in (5, 4):
        keys, counts = octree.key(d), octree.count(d)
        xyz, valid = octree.xyz(d), octree.node_valid(d)
        N = keys.shape[1]
        C = 256
        x = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.2, (27, C)), jnp.bfloat16)

        def fwd(x, w, d=d, keys=keys, counts=counts, xyz=xyz, valid=valid):
            return octree_dwconv_dense(x, keys, counts, xyz, valid, w, d)

        def loss(x, w, d=d):
            return jnp.sum(fwd(x, w).astype(jnp.float32) ** 2)

        _record(results, f"dense_cpe_fwd_d{d}",
                ms=_time(jax.jit(fwd), x, w))
        _record(results, f"dense_cpe_fwdbwd_d{d}",
                ms=_time(jax.jit(jax.grad(loss, argnums=(0, 1))), x, w))


def exp_rtsa(results):
    import jax
    import jax.numpy as jnp
    from hotformerloc_tpu.models.attention import TokenAttention

    B, Nrt, C, H = 8, 232, 256, 16
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (B, Nrt, C)), jnp.bfloat16)
    mask = jnp.ones((B, Nrt), bool)
    mod = TokenAttention(C, H, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x, mask)

    def fwd(p, x):
        return mod.apply(p, x, mask)

    def loss(p, x):
        return jnp.sum(fwd(p, x).astype(jnp.float32) ** 2)

    _record(results, "rtsa_fwd", ms=_time(jax.jit(fwd), params, x))
    _record(results, "rtsa_fwdbwd",
            ms=_time(jax.jit(jax.grad(loss, argnums=1)), params, x))


def exp_pool(results):
    import jax
    import jax.numpy as jnp
    from hotformerloc_tpu.models.pooling import PyramidAttnPool

    B, C = 8, 256
    Ns = (4224, 4224, 2688)
    rng = np.random.default_rng(4)
    toks = [jnp.asarray(rng.normal(0, 1, (B, n, C)), jnp.bfloat16)
            for n in Ns]
    masks = [jnp.ones((B, n), bool) for n in Ns]
    mod = PyramidAttnPool(256, 256, (C,) * 3, (74, 36, 18), "mixer",
                          dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), toks, masks, True)

    def fwd(p, toks):
        return mod.apply(p, toks, masks, True)

    def loss(p, toks):
        return jnp.sum(fwd(p, toks).astype(jnp.float32) ** 2)

    _record(results, "pool_fwd", ms=_time(jax.jit(fwd), params, toks))
    _record(results, "pool_fwdbwd",
            ms=_time(jax.jit(jax.grad(loss, argnums=1)), params, toks))


def exp_noremat(results):
    import jax
    import jax.numpy as jnp
    from hotformerloc_tpu.losses.losses import make_loss
    from hotformerloc_tpu.models.config import oxford_config
    from hotformerloc_tpu.models.hotformerloc import HOTFormerLoc

    B = 8
    for tag, ckpt in (("noremat", False), ("remat", True)):
        cfg = oxford_config(grad_checkpoint=ckpt)
        model = HOTFormerLoc(cfg, dtype=jnp.bfloat16)
        loss_fn = make_loss("truncatedsmoothap", positives_per_query=4)
        rng = np.random.default_rng(0)
        base = rng.uniform(-0.9, 0.9, (B // 2, cfg.num_points, 3)) \
            .astype(np.float32)
        pts = jnp.asarray(np.repeat(base, 2, axis=0))
        msk = jnp.ones((B, cfg.num_points), bool)
        groups = np.repeat(np.arange(B // 2), 2)
        pm = jnp.asarray((groups[:, None] == groups[None]) &
                         ~np.eye(B, dtype=bool))
        nm = jnp.asarray(groups[:, None] != groups[None])
        variables = model.init(jax.random.PRNGKey(0), pts, msk)

        def loss(params, other):
            emb = model.apply({"params": params, **other}, pts, msk)
            return loss_fn(emb["global"], pm, nm)[0]

        other = {k: v for k, v in variables.items() if k != "params"}
        try:
            g = jax.jit(jax.grad(loss))
            ms = _time(g, variables["params"], other, iters=3)
            _record(results, f"grad_mb8_{tag}", ms=ms)
        except Exception as e:
            _record(results, f"grad_mb8_{tag}", error=str(e)[:1500])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="all")
    args = ap.parse_args()
    exps = {"band": exp_band, "cpe": exp_cpe, "dense": exp_dense,
            "rtsa": exp_rtsa, "pool": exp_pool, "noremat": exp_noremat}
    want = list(exps) if args.exp == "all" else args.exp.split(",")

    results = {}
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            results = json.load(f)
    import jax
    results["device"] = jax.devices()[0].device_kind
    for name in want:
        print(f"=== {name} ===", flush=True)
        try:
            exps[name](results)
        except Exception as e:
            _record(results, f"{name}_FAILED", error=str(e)[:300])
        with open(RESULTS_PATH, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", RESULTS_PATH)


if __name__ == "__main__":
    main()
