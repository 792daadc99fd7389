import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax, jax.numpy as jnp, numpy as np, time
from hotformerloc_tpu.ops.pallas.window_attn import fused_window_attention
print("backend", jax.default_backend(), flush=True)
BW, T, C, H, G = 64, 65, 256, 16, 1
K = T - G
bnd = int(0.8 * 64)
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0,1,(BW,T,C)), jnp.bfloat16)
k = jnp.asarray(rng.normal(0,1,(BW,T,C)), jnp.bfloat16)
v = jnp.asarray(rng.normal(0,1,(BW,T,C)), jnp.bfloat16)
xyz = jnp.asarray(rng.integers(0,2**6,(BW,3,K)), jnp.int32)
mask = jnp.asarray(rng.integers(0,2,(BW,T)), jnp.int32)
tab = jnp.asarray(rng.normal(0,0.02,(3*(2*bnd+1),H)), jnp.float32)
f = jax.jit(lambda *a: fused_window_attention(*a, H, G, bnd, True, 8, False))
try:
    t0=time.time()
    out = f(q,k,v,xyz,mask,tab)
    jax.block_until_ready(out)
    print("fwd OK", out.shape, "compile+run", round(time.time()-t0,1), flush=True)
    g = jax.jit(jax.grad(lambda q,k,v,tab: jnp.sum(fused_window_attention(q,k,v,xyz,mask,tab,H,G,bnd,True,4,False).astype(jnp.float32)**2), argnums=(0,1,2,3)))
    t0=time.time()
    gr = g(q,k,v,tab)
    jax.block_until_ready(gr)
    print("bwd OK compile+run", round(time.time()-t0,1), flush=True)
except Exception as e:
    print("FAIL:", type(e).__name__, str(e)[:2000])
