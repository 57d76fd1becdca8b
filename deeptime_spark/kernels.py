"""Kernel library — deeptime's scalar-function layer (SURVEY.md §2.11).

Reference: ``GaussianKernel``/``GeneralizedGaussianKernel``/
``LaplacianKernel``/``PolynomialKernel``
(/root/reference/src/deeptime/kernels/_kernels.py:7-160), ``ProductKernel``
and ``Kernel.gram/apply`` (kernels/_base.py:35-102).

Each kernel exposes THREE evaluation surfaces:

- ``apply(X, Y)`` — driver numpy pairwise matrix (the reference parity
  surface; used by KernelEDMD/KernelCCA/KVAD on landmark-sized samples);
- ``expr(a, b)`` — a Spark Column expression between two array columns
  (JVM-side pairwise kernel for joins against a broadcast landmark set);
- ``gram_df(df, landmarks)`` — the distributed Gram block: each row gains
  ``k`` columns against a broadcast landmark array (the T x m tall-skinny
  Gram, the scale-safe form; the full T x T Gram is only materialized
  driver-side and its quadratic cost is documented).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deeptime_spark.operators.similarity import _literal_array, dot


def _sq_dist_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v)


class Kernel:
    """Base: scalar call, pairwise numpy apply, Spark column expr."""

    def __call__(self, x, y) -> float:
        return float(self.apply(np.atleast_2d(x), np.atleast_2d(y))[0, 0])

    def apply(self, X: np.ndarray, Y: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def gram(self, X: np.ndarray) -> np.ndarray:
        """T x T Gram matrix (reference _base.py:35-100). Driver-side;
        quadratic — use landmark subsets for big T."""
        return self.apply(X, X)

    def expr(self, a: Column, b: Column) -> Column:
        raise NotImplementedError

    def gram_df(self, df: DataFrame, landmarks: np.ndarray, x_col: str = "x", out_col: str = "k") -> DataFrame:
        """Tall-skinny Gram block: k[i] = kernel(x, landmark_i) as an array
        column. Landmarks ship as literals (broadcast); evaluation is one
        JVM expression per landmark — map-only, any scale."""
        cols = [self.expr(F.col(x_col), _literal_array(lm)) for lm in np.atleast_2d(landmarks)]
        return df.withColumn(out_col, F.array(*cols))

    def __mul__(self, other: "Kernel") -> "ProductKernel":
        return ProductKernel(self, other)


class GaussianKernel(Kernel):
    """exp(-||x-y||^2 / (2 sigma^2)) (reference _kernels.py:7-64)."""

    def __init__(self, sigma: float):
        self.sigma = float(sigma)

    def apply(self, X, Y):
        x2 = np.square(X).sum(axis=-1, keepdims=True)
        y2 = np.square(Y).sum(axis=-1, keepdims=True)
        D = np.clip(y2.T - 2.0 * X @ Y.T + x2, 1e-16, None)
        return np.exp(-D / (2.0 * self.sigma * self.sigma))

    def expr(self, a, b):
        return F.exp(-_sq_dist_expr(a, b) / F.lit(2.0 * self.sigma * self.sigma))

    def __str__(self):
        return f"GaussianKernel[sigma={self.sigma}]"


class GeneralizedGaussianKernel(Kernel):
    """Per-dimension bandwidths (reference _kernels.py:65-99)."""

    def __init__(self, sigmas: np.ndarray):
        self.sigmas = np.asarray(sigmas, dtype=np.float64).squeeze()
        self._sqrt_D = 1.0 / (np.sqrt(2.0) * self.sigmas)

    def apply(self, X, Y):
        rij = (X[:, None, :] - Y[None, :, :]) * self._sqrt_D
        return np.exp(-np.square(rij).sum(axis=-1))

    def expr(self, a, b):
        w = _literal_array(self._sqrt_D)
        scaled = F.zip_with(F.zip_with(a, b, lambda x, y: x - y), w, lambda d, s: d * s * d * s)
        return F.exp(-F.aggregate(scaled, F.lit(0.0), lambda acc, v: acc + v))

    def __str__(self):
        return f"GeneralizedGaussianKernel[sigmas={self.sigmas}]"


class LaplacianKernel(Kernel):
    """exp(-||x-y|| / sigma) (reference _kernels.py:100-121)."""

    def __init__(self, sigma: float):
        self.sigma = float(sigma)

    def apply(self, X, Y):
        x2 = np.square(X).sum(axis=-1, keepdims=True)
        y2 = np.square(Y).sum(axis=-1, keepdims=True)
        D = np.sqrt(np.clip(y2.T - 2.0 * X @ Y.T + x2, 0.0, None))
        return np.exp(-D / self.sigma)

    def expr(self, a, b):
        return F.exp(-F.sqrt(_sq_dist_expr(a, b)) / F.lit(self.sigma))

    def __str__(self):
        return f"LaplacianKernel[sigma={self.sigma}]"


class PolynomialKernel(Kernel):
    """(x.y + c)^degree (reference _kernels.py:122-160)."""

    def __init__(self, degree: int, inhomogeneity: float = 1.0):
        if degree < 0 or inhomogeneity < 0:
            raise ValueError("degree and inhomogeneity must be non-negative")
        self.degree = int(degree)
        self.inhomogeneity = float(inhomogeneity)

    def apply(self, X, Y):
        return (self.inhomogeneity + X @ Y.T) ** self.degree

    def expr(self, a, b):
        return F.pow(F.lit(self.inhomogeneity) + dot(a, b), F.lit(float(self.degree)))

    def __str__(self):
        return f"PolynomialKernel[degree={self.degree}, c={self.inhomogeneity}]"


class ProductKernel(Kernel):
    """Pointwise product of two kernels (reference _base.py:102-116)."""

    def __init__(self, k1: Kernel, k2: Kernel):
        self.k1 = k1
        self.k2 = k2

    def apply(self, X, Y):
        return self.k1.apply(X, Y) * self.k2.apply(X, Y)

    def expr(self, a, b):
        return self.k1.expr(a, b) * self.k2.expr(a, b)

    def __str__(self):
        return f"ProductKernel[{self.k1} * {self.k2}]"
