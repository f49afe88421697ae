"""Multi-kernel Gaussian MMD over scalar samples (ref evaluation/mmd.py:6-63).

Numpy rewrite of the DIG implementation: bandwidth = mean pairwise squared
distance over the pooled sample, 5 kernels at powers of ``kernel_mul``
around it. Batched over rows so 20k-sample inputs stay within memory
(the reference batches identically, ref :30-61).
"""

from __future__ import annotations

import numpy as np


def _batched_kernel_sum(a, b, bandwidths, batch_size):
    """sum_i sum_j sum_k exp(-(a_i - b_j)^2 / bw_k), batched over a."""
    total = 0.0
    for start in range(0, len(a), batch_size):
        chunk = a[start : start + batch_size]
        d2 = (chunk[:, None] - b[None, :]) ** 2
        for bw in bandwidths:
            total += np.exp(-d2 / bw).sum()
    return total


def compute_mmd(source, target, batch_size=1000, kernel_mul=2.0, kernel_num=5, fix_sigma=None):
    source = np.asarray(source, dtype=np.float64).reshape(-1)
    target = np.asarray(target, dtype=np.float64).reshape(-1)
    n_source, n_target = len(source), len(target)
    n_samples = n_source + n_target
    total = np.concatenate([source, target])

    if fix_sigma:
        bandwidth = fix_sigma
    else:
        bandwidth = 0.0
        for start in range(0, n_samples, batch_size):
            chunk = total[start : start + batch_size]
            bandwidth += ((total[None, :] - chunk[:, None]) ** 2).sum()
        bandwidth /= n_samples**2 - n_samples
    bandwidth /= kernel_mul ** (kernel_num // 2)
    bandwidths = [bandwidth * (kernel_mul**i) for i in range(kernel_num)]

    xx = _batched_kernel_sum(source, source, bandwidths, batch_size) / (n_source**2)
    yy = _batched_kernel_sum(target, target, bandwidths, batch_size) / (n_target**2)
    xy = _batched_kernel_sum(source, target, bandwidths, batch_size) / (
        n_source * n_target
    )
    return float(xx + yy - 2 * xy)
