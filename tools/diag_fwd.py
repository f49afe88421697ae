import os, sys, time, threading
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LOG = "/root/repo/tools/diagf.log"
def log(m):
    with open(LOG, "a") as f: f.write(m+"\n")

import resource
def cpu_time():
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime

import jax, jax.numpy as jnp, numpy as np
from diffspectra_tpu.configs import diffspectra_qm9s
from diffspectra_tpu.models.dmt import DMT
from diffspectra_tpu.utils import masks as M

cfg = diffspectra_qm9s.get_config(); cfg.data.spectra_version="ir"; cfg.model.dropout=0.0
n, bs = cfg.data.max_node, int(os.environ.get("B","64"))
key = jax.random.PRNGKey(0)
model = DMT.from_config(cfg)
node_mask, edge_mask = M.build_masks(jnp.asarray(np.random.default_rng(0).integers(12,n+1,size=bs)), n)
t0=time.time()
variables = jax.jit(model.init)(key, jnp.zeros((bs,)), jnp.zeros((bs,n,9)), node_mask, edge_mask, None,
   edge_x=jnp.zeros((bs,n,n,2)), noise_level=jnp.zeros((bs,)), context_emb=jnp.zeros((bs,1024)))
jax.block_until_ready(jax.tree_util.tree_leaves(variables)[0])
log(f"init {time.time()-t0:.1f}s backend={jax.default_backend()}")

def fwd(xh, edge_x):
    return model.apply(variables, jnp.full((bs,),0.5), xh, node_mask, edge_mask, None,
        edge_x=edge_x, noise_level=jnp.full((bs,),-1.0), context_emb=jnp.zeros((bs,1024)))

xh = jax.random.normal(key,(bs,n,9))*node_mask
edge_x = M.sample_symmetric_edge_feature_noise(key,bs,n,2,edge_mask)
lowered = jax.jit(fwd).lower(xh, edge_x)
log("lowered")
t0=time.time(); c0=cpu_time()
compiled = lowered.compile()
log(f"compile wall {time.time()-t0:.1f}s cpu {cpu_time()-c0:.1f}s")
t0=time.time()
out = compiled(xh, edge_x); jax.block_until_ready(out)
log(f"first run {time.time()-t0:.3f}s")
t0=time.time()
out = compiled(xh, edge_x); jax.block_until_ready(out)
log(f"second run {time.time()-t0:.4f}s")
