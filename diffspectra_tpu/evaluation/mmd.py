"""Multi-kernel Gaussian MMD over scalar samples (ref evaluation/mmd.py:6-63).

Rewrite of the DIG implementation: bandwidth = mean pairwise squared
distance over the pooled sample, 5 kernels at powers of ``kernel_mul``
around it.

The reference evaluates the O(n^2) kernel sums with torch on the eval
device; at the 20k-sample cap that is ~2e9 exp evaluations per distribution
— minutes per geometry symbol in numpy. Here the kernel sums run as a
single jitted jax program (TPU when available, CPU otherwise), with a
batched numpy fallback.
"""

from __future__ import annotations

import numpy as np

_JIT_CACHE = {}


def _kernel_sums_jax(total, n_source, kernel_mul, kernel_num):
    import jax
    import jax.numpy as jnp

    key = (int(total.shape[0]), int(n_source), float(kernel_mul), int(kernel_num))
    if key not in _JIT_CACHE:

        @jax.jit
        def f(total):
            n = total.shape[0]
            d2 = (total[None, :] - total[:, None]) ** 2
            bandwidth = jnp.sum(d2) / (n * n - n)
            bandwidth = bandwidth / (kernel_mul ** (kernel_num // 2))
            kernels = jnp.zeros_like(d2)
            for i in range(kernel_num):
                kernels = kernels + jnp.exp(-d2 / (bandwidth * kernel_mul**i))
            xx = jnp.sum(kernels[:n_source, :n_source])
            yy = jnp.sum(kernels[n_source:, n_source:])
            xy = jnp.sum(kernels[:n_source, n_source:])
            return xx, yy, xy

        _JIT_CACHE[key] = f
    return _JIT_CACHE[key](total)


def _kernel_sums_numpy(total, n_source, kernel_mul, kernel_num, batch_size):
    n = len(total)
    bandwidth = 0.0
    for start in range(0, n, batch_size):
        chunk = total[start : start + batch_size]
        bandwidth += ((total[None, :] - chunk[:, None]) ** 2).sum()
    bandwidth /= n**2 - n
    bandwidth /= kernel_mul ** (kernel_num // 2)
    bandwidths = [bandwidth * (kernel_mul**i) for i in range(kernel_num)]

    xx = yy = xy = 0.0
    for start in range(0, n, batch_size):
        chunk = total[start : start + batch_size]
        d2 = (chunk[:, None] - total[None, :]) ** 2
        k = sum(np.exp(-d2 / bw) for bw in bandwidths)
        rows = np.arange(start, min(start + batch_size, n))
        src_rows = rows < n_source
        xx += k[src_rows][:, :n_source].sum()
        yy += k[~src_rows][:, n_source:].sum()
        xy += k[src_rows][:, n_source:].sum()
    return xx, yy, xy


def compute_mmd(source, target, batch_size=1000, kernel_mul=2.0, kernel_num=5, fix_sigma=None):
    source = np.asarray(source, dtype=np.float32).reshape(-1)
    target = np.asarray(target, dtype=np.float32).reshape(-1)
    n_source, n_target = len(source), len(target)
    total = np.concatenate([source, target])

    if fix_sigma:
        # fixed-bandwidth path (rarely used) stays in numpy
        bandwidths = [
            fix_sigma / (kernel_mul ** (kernel_num // 2)) * (kernel_mul**i)
            for i in range(kernel_num)
        ]
        xx = yy = xy = 0.0
        for start in range(0, len(total), batch_size):
            chunk = total[start : start + batch_size]
            d2 = (chunk[:, None] - total[None, :]) ** 2
            k = sum(np.exp(-d2 / bw) for bw in bandwidths)
            rows = np.arange(start, min(start + batch_size, len(total)))
            src_rows = rows < n_source
            xx += k[src_rows][:, :n_source].sum()
            yy += k[~src_rows][:, n_source:].sum()
            xy += k[src_rows][:, n_source:].sum()
    else:
        # the dense pooled kernel matrix is (n_src+n_tgt)^2 floats; keep the
        # jitted path under ~2GB and fall back to batched numpy beyond
        if len(total) <= 22000:
            try:
                xx, yy, xy = _kernel_sums_jax(total, n_source, kernel_mul, kernel_num)
                xx, yy, xy = float(xx), float(yy), float(xy)
            except Exception:  # pragma: no cover - no accelerator memory etc.
                xx, yy, xy = _kernel_sums_numpy(
                    total.astype(np.float64), n_source, kernel_mul, kernel_num,
                    batch_size,
                )
        else:
            xx, yy, xy = _kernel_sums_numpy(
                total.astype(np.float64), n_source, kernel_mul, kernel_num, batch_size
            )

    return float(xx / (n_source**2) + yy / (n_target**2) - 2 * xy / (n_source * n_target))
