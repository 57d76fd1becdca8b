"""Basis functions / observables — the featurization layer.

Reference: Identity/Monomials
(/root/reference/src/deeptime/basis/_monomials.py:9,24-120), Observable
composition (basis/_base.py:7,47). Realized as generated column expressions
(products of powers of array elements) — pure Catalyst, codegen-friendly,
equivalent in spirit to MLlib's PolynomialExpansion but keeping our
array<double> schema.
"""

from __future__ import annotations

from itertools import combinations_with_replacement

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deeptime_spark.base import Transformer


class Identity(Transformer):
    """f(x) = x (reference: basis/_monomials.py:9-22)."""

    def __call__(self, df: DataFrame, x_col: str = "x", out_col: str = "x") -> DataFrame:
        if out_col == x_col:
            return df
        return df.withColumn(out_col, F.col(x_col))

    def transform(self, df: DataFrame, **kw) -> DataFrame:
        return self(df, **kw)


class Monomials(Transformer):
    """All monomials up to total degree p over d features
    (reference: basis/_monomials.py:24-120).

    Feature order: degree-ascending, within a degree the
    combinations_with_replacement order of indices — deterministic, exposed
    via ``get_feature_names_out``. Includes the constant 1 term (degree 0),
    matching PolynomialFeatures(include_bias=True) used by SINDy's default
    library (reference sindy/_sindy.py:284).
    """

    def __init__(self, p: int, d: int, include_bias: bool = True):
        self.p = p
        self.d = d
        self.include_bias = include_bias
        self._powers: list[tuple[int, ...]] = []
        if include_bias:
            self._powers.append(tuple())
        for degree in range(1, p + 1):
            self._powers.extend(combinations_with_replacement(range(d), degree))

    def get_feature_names_out(self) -> list[str]:
        names = []
        for combo in self._powers:
            if not combo:
                names.append("1")
            else:
                names.append("*".join(f"x{i}" for i in combo))
        return names

    def __call__(self, df: DataFrame, x_col: str = "x", out_col: str = "phi") -> DataFrame:
        exprs = []
        for combo in self._powers:
            if not combo:
                exprs.append(F.lit(1.0))
            else:
                e = F.col(x_col)[combo[0]]
                for i in combo[1:]:
                    e = e * F.col(x_col)[i]
                exprs.append(e)
        return df.withColumn(out_col, F.array(*exprs))

    def transform(self, df: DataFrame, **kw) -> DataFrame:
        return self(df, **kw)


class Concatenation(Transformer):
    """f1 o f2 composition (reference: basis/_base.py:47-71)."""

    def __init__(self, outer: Transformer, inner: Transformer):
        self.outer = outer
        self.inner = inner

    def __call__(self, df: DataFrame, x_col: str = "x", out_col: str = "phi") -> DataFrame:
        mid = self.inner(df, x_col=x_col, out_col="_inner")
        out = self.outer(mid, x_col="_inner", out_col=out_col)
        return out.drop("_inner")

    def transform(self, df: DataFrame, **kw) -> DataFrame:
        return self(df, **kw)
