import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LOG = "/root/repo/tools/diagp.log"
def log(m):
    with open(LOG, "a") as f: f.write(m+"\n")

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
from diffspectra_tpu.ops.pallas_attention import mix_attention, mix_attention_reference
from diffspectra_tpu.utils import masks as M

B, N, de = 128, 29, 64
n_heads, n_extra, out_ch = 16, 2, 16
n_sub = n_heads - n_extra
sub_c = (n_heads*out_ch)//n_sub
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
q = jax.random.normal(ks[0], (B,N,n_sub,sub_c), jnp.bfloat16)
k = jax.random.normal(ks[1], (B,N,n_sub,sub_c), jnp.bfloat16)
v = jax.random.normal(ks[2], (B,N,n_heads,out_ch), jnp.bfloat16)
edge = jax.random.normal(ks[3], (B,N,N,de), jnp.bfloat16)
w0 = (jax.random.normal(ks[4], (de,n_sub*sub_c))*0.1).astype(jnp.bfloat16)
w1 = (jax.random.normal(ks[5], (de,n_heads*out_ch))*0.1).astype(jnp.bfloat16)
extra = (jax.random.uniform(ks[6], (B,N,N,n_extra))>0.5).astype(jnp.float32)
_, edge_mask = M.build_masks(jax.random.randint(ks[7],(B,),12,N+1), N)

f_pallas = jax.jit(lambda *a: mix_attention(*a, set_inf=True, batch_tile=8))
f_ref = jax.jit(lambda *a: mix_attention_reference(*a, set_inf=True))
args = (q,k,v,edge,w0,w1,extra,edge_mask)
try:
    t0=time.time(); out_p = f_pallas(*args); jax.block_until_ready(out_p)
    log("pallas compile+run %.1fs" % (time.time()-t0))
    t0=time.time()
    for _ in range(20): out_p = f_pallas(*args)
    jax.block_until_ready(out_p); log("pallas 20x run %.4fs" % (time.time()-t0))
except Exception as e:
    log(f"PALLAS FAILED: {type(e).__name__}: {str(e)[:500]}")
t0=time.time(); out_r = f_ref(*args); jax.block_until_ready(out_r)
log("ref compile+run %.1fs" % (time.time()-t0))
t0=time.time()
for _ in range(20): out_r = f_ref(*args)
jax.block_until_ready(out_r); log("ref 20x run %.4fs" % (time.time()-t0))
try:
    err = float(jnp.max(jnp.abs(out_p - out_r)))
    log(f"max abs diff {err:.5f}")
except Exception:
    pass

# ---- second kernel: fused equi-update chain (ops/pallas_equi_update.py)
from diffspectra_tpu.ops.pallas_equi_update import (
    equi_update_fused, equi_update_reference,
)

DH, DE2, DD2, A = 256, 64, 64, 2
ks2 = jax.random.split(jax.random.PRNGKey(1), 15)
eq_args = (
    jax.random.normal(ks2[0], (B, N, DH), jnp.bfloat16),
    jax.random.normal(ks2[1], (B, N, DH), jnp.bfloat16),
    jax.random.normal(ks2[2], (B, N, N, DE2), jnp.bfloat16),
    jnp.abs(jax.random.normal(ks2[3], (B, N, N, DD2), jnp.bfloat16)),
    jax.random.normal(ks2[4], (B, N, N, 3)) * 0.1,
    (jax.random.uniform(ks2[5], (B, N, N, A)) > 0.5).astype(jnp.float32),
    edge_mask,
    jax.random.normal(ks2[6], (DE2, DH)) * 0.1,
    jax.random.normal(ks2[7], (DD2, DH)) * 0.1,
    jax.random.normal(ks2[8], (DH,)) * 0.1,
    jax.random.normal(ks2[9], (B, DH)) * 0.1,
    jax.random.normal(ks2[10], (B, DH)) * 0.1,
    jax.random.normal(ks2[11], (DH, DH)) * 0.1,
    jax.random.normal(ks2[12], (DH,)) * 0.1,
    jax.random.normal(ks2[13], (DH, 1 + A)) * 0.3,
)
fe_pallas = jax.jit(lambda *a: equi_update_fused(*a, batch_tile=2))
fe_ref = jax.jit(lambda *a: equi_update_reference(*a))
try:
    t0 = time.time(); eq_p = fe_pallas(*eq_args); jax.block_until_ready(eq_p)
    log("equi pallas compile+run %.1fs" % (time.time() - t0))
    t0 = time.time()
    for _ in range(20): eq_p = fe_pallas(*eq_args)
    jax.block_until_ready(eq_p); log("equi pallas 20x run %.4fs" % (time.time() - t0))
except Exception as e:
    log(f"EQUI PALLAS FAILED: {type(e).__name__}: {str(e)[:500]}")
t0 = time.time(); eq_r = fe_ref(*eq_args); jax.block_until_ready(eq_r)
log("equi ref compile+run %.1fs" % (time.time() - t0))
t0 = time.time()
for _ in range(20): eq_r = fe_ref(*eq_args)
jax.block_until_ready(eq_r); log("equi ref 20x run %.4fs" % (time.time() - t0))
try:
    err = float(jnp.max(jnp.abs(eq_p - eq_r)))
    log(f"equi max abs diff {err:.5f}")
except Exception:
    pass
