"""Bisect WHICH Pallas/Mosaic feature trips the remote compile helper.

2026-08-20: a trivial pallas_call compiles and runs on this chip (first
time any Mosaic payload has been accepted — see PALLAS.md status history),
but both repo kernels (ops/pallas_attention.py, ops/pallas_equi_update.py)
still draw HTTP 500 from the tpu_compile_helper. The helper's stderr is
server-side and unavailable, so this probes features one at a time:
shapes, grids, dots, transcendentals, masking, scratch — printing PASS/FAIL
per probe to stdout and tools/diagm.log.
"""
import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LOG = "/root/repo/tools/diagm.log"


def log(m):
    print(m, flush=True)
    with open(LOG, "a") as f:
        f.write(m + "\n")


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        log(f"PASS {name}")
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
        log(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


# 1. trivial elementwise, aligned shape
def t1():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0
    x = jnp.ones((256, 256), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32))(x)


# 2. unaligned last-two dims (29, 29)
def t2():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0
    x = jnp.ones((29, 29), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((29, 29), jnp.float32))(x)


# 3. rank-4 tensor [8,29,29,64]
def t3():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0
    x = jnp.ones((8, 29, 29, 64), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 29, 29, 64), jnp.float32))(x)


# 4. grid over batch with BlockSpec
def t4():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0
    x = jnp.ones((8, 29, 29, 64), jnp.float32)
    return pl.pallas_call(
        k,
        grid=(8,),
        in_specs=[pl.BlockSpec((1, 29, 29, 64), lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 29, 29, 64), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 29, 29, 64), jnp.float32),
    )(x)


# 5. dot on unaligned [29*29, 64] x [64, 252]
def t5():
    def k(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    x = jnp.ones((841, 64), jnp.float32)
    w = jnp.ones((64, 252), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((841, 252), jnp.float32))(x, w)


# 6. tanh
def t6():
    def k(x_ref, o_ref):
        o_ref[...] = jnp.tanh(x_ref[...])
    x = jnp.ones((256, 256), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32))(x)


# 7. bf16 dot
def t7():
    def k(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    x = jnp.ones((841, 64), jnp.bfloat16)
    w = jnp.ones((64, 256), jnp.bfloat16)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((841, 256), jnp.float32))(x, w)


# 8. softmax over last axis, unaligned
def t8():
    def k(x_ref, o_ref):
        o_ref[...] = jax.nn.softmax(x_ref[...], axis=-1)
    x = jnp.ones((29, 29), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((29, 29), jnp.float32))(x)


# 9. where-mask + big negative
def t9():
    def k(x_ref, m_ref, o_ref):
        o_ref[...] = jnp.where(m_ref[...] > 0, x_ref[...], -1e10)
    x = jnp.ones((29, 29), jnp.float32)
    m = jnp.ones((29, 29), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((29, 29), jnp.float32))(x, m)


# 10. reshape inside kernel (e.g. [841,252] -> [29,29,14,18])
def t10():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(29, 29, 14, 18).sum(-1)
    x = jnp.ones((841, 252), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((29, 29, 14), jnp.float32))(x)


# 11. 5D block rank (the attention kernel's e0 view)
def t11():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0
    x = jnp.ones((2, 29, 29, 14, 18), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((2, 29, 29, 14, 18), jnp.float32))(x)


# 12. scratch VMEM + multiple outputs
def t12():
    def k(x_ref, o_ref, scratch):
        scratch[...] = x_ref[...] * 2.0
        o_ref[...] = scratch[...] + 1.0
    x = jnp.ones((256, 256), jnp.float32)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        scratch_shapes=[pl.pallas.tpu.VMEM((256, 256), jnp.float32)]
        if hasattr(pl, "pallas") else [],
    )(x)


# 13. einsum-style 3-operand product with broadcast then reduce
def t13():
    def k(q_ref, k_ref, o_ref):
        q = q_ref[...]  # [29, 252]
        kk = k_ref[...]
        o_ref[...] = jnp.dot(q, kk.T, preferred_element_type=jnp.float32)
    q = jnp.ones((29, 252), jnp.float32)
    kk = jnp.ones((29, 252), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((29, 29), jnp.float32))(q, kk)


def t14():
    # broadcast multiply [29,1,c] * [1,29,c] then sum over c (VPU reduce)
    def k(q_ref, k_ref, o_ref):
        q = q_ref[...][:, None, :]
        kk = k_ref[...][None, :, :]
        o_ref[...] = (q * kk).sum(-1)
    q = jnp.ones((29, 64), jnp.float32)
    kk = jnp.ones((29, 64), jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((29, 29), jnp.float32))(q, kk)


if __name__ == "__main__":
    import datetime

    log(f"--- mosaic bisect {datetime.datetime.now().isoformat()} ---")
    for name, fn in sorted(
        {k: v for k, v in globals().items() if k.startswith("t") and callable(v)}.items(),
        key=lambda kv: int(kv[0][1:]),
    ):
        probe(name, fn)
