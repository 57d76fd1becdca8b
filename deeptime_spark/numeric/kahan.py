"""Kahan-compensated summation (reference ``deeptime.numeric.ksum``/
``kdot``, C++ kahan_summation.h:19-80).

Driver-side kernels: the rate-matrix estimators consume them on small
matrices. Distributed sums in this engine go through Spark's fp64
tree-aggregation, whose pairwise partial sums already bound error growth
at O(log n) — a per-element compensated Spark aggregate would force a
strict sequential fold and break map-side combining, so the compensated
forms are deliberately driver-only.
"""

from __future__ import annotations

import numpy as np


def ksum(arr) -> float:
    """Kahan-Neumaier compensated sum of all elements."""
    s = 0.0
    c = 0.0
    for x in np.asarray(arr, dtype=np.float64).ravel():
        t = s + x
        if abs(s) >= abs(x):
            c += (s - t) + x
        else:
            c += (x - t) + s
        s = t
    return s + c


def kdot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Matrix product with Kahan-compensated inner sums
    (kahan_summation.h:47-80)."""
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    out = np.empty((a.shape[0], b.shape[1]))
    for i in range(a.shape[0]):
        for j in range(b.shape[1]):
            out[i, j] = ksum(a[i, :] * b[:, j])
    return out
