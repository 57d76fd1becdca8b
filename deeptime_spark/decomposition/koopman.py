"""Koopman models: the fitted projections produced by TICA/VAMP.

Reference: ``TransferOperatorModel``
(/root/reference/src/deeptime/decomposition/_koopman.py:14-129) and
``CovarianceKoopmanModel`` (:131-763). The model is driver-side (small
matrices); ``transform`` runs on executors as generated column expressions
(linear projection of the feature array) — fully inside whole-stage codegen,
no Python in the hot path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deeptime_spark.base import Model, Transformer


PROJECT_EXPR_MAX_DIM = 24  # above this, k*d codegen nodes stop paying off


def _project_expr(df: DataFrame, W: np.ndarray, mu: Optional[np.ndarray], x_col: str, out_col: str) -> DataFrame:
    """out = W (x - mu) as array column; W is (k, d).

    Two physical strategies (mirrors operators/moments.py):

    - d <= PROJECT_EXPR_MAX_DIM: k*d literal-product expressions, fully
      inside whole-stage codegen — zero Python in the hot path.
    - large d (e.g. 768-d embedding columns): Arrow-batched pandas_udf
      doing one BLAS gemm per batch with the (k, d) matrix broadcast in
      the closure — O(k) expression nodes, so Catalyst compiles fine.
    """
    k, d = W.shape
    if d <= PROJECT_EXPR_MAX_DIM:
        x = [F.col(x_col)[j] - (F.lit(float(mu[j])) if mu is not None else F.lit(0.0)) for j in range(d)]
        comps = []
        for i in range(k):
            expr = F.lit(0.0)
            for j in range(d):
                wij = float(W[i, j])
                if wij != 0.0:
                    expr = expr + F.lit(wij) * x[j]
            comps.append(expr)
        return df.withColumn(out_col, F.array(*comps))

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    Wb = np.ascontiguousarray(W, dtype=np.float64)
    mub = None if mu is None else np.asarray(mu, dtype=np.float64)

    @pandas_udf(ArrayType(DoubleType()))
    def project(xs: pd.Series) -> pd.Series:
        X = np.stack(xs.to_numpy()).astype(np.float64, copy=False)
        if mub is not None:
            X = X - mub
        Y = X @ Wb.T
        return pd.Series(list(Y))

    return df.withColumn(out_col, project(F.col(x_col)))


class TransferOperatorModel(Model, Transformer):
    """Minimal E[g(x_{t+tau})] = K^T E[f(x_t)] model (_koopman.py:14-129).

    U maps features to f-space (instantaneous), V to g-space (timelagged);
    K is the Koopman matrix in those bases.
    """

    def __init__(
        self,
        koopman_matrix: np.ndarray,
        U: np.ndarray,
        V: np.ndarray,
        mean_0: Optional[np.ndarray] = None,
        mean_t: Optional[np.ndarray] = None,
        x_col: str = "x",
    ):
        self.koopman_matrix = koopman_matrix
        self.U = U  # (d, k): f(x) = U^T (x - mean_0)
        self.V = V  # (d, k): g(x) = V^T (x - mean_t)
        self.mean_0 = mean_0
        self.mean_t = mean_t
        self.x_col = x_col

    @property
    def output_dimension(self) -> int:
        return self.U.shape[1]

    def transform(self, df: DataFrame, propagate: bool = False, out_col: str = "proj") -> DataFrame:
        """Project onto instantaneous singular/eigen-functions (f-space);
        with ``propagate``, onto the timelagged g-space (_koopman.py:90-128)."""
        if propagate:
            return _project_expr(df, self.V.T, self.mean_t, self.x_col, out_col)
        return _project_expr(df, self.U.T, self.mean_0, self.x_col, out_col)

    def forward(self, x: np.ndarray) -> np.ndarray:
        """Driver-side single-vector propagation (numpy parity surface)."""
        f = (np.atleast_2d(x) - (self.mean_0 if self.mean_0 is not None else 0.0)) @ self.U
        return f @ self.koopman_matrix


class CovarianceKoopmanModel(TransferOperatorModel):
    """Koopman model over covariance pairs (_koopman.py:131-763).

    singular_values: Koopman singular values (TICA: eigenvalues).
    ``timescales = -lagtime / ln|sigma_i|`` (_koopman.py:613-650);
    ``score`` VAMP-r (_koopman.py:434-487).
    """

    def __init__(
        self,
        singular_values: np.ndarray,
        U: np.ndarray,
        V: np.ndarray,
        cov: "object" = None,
        lagtime: int = 1,
        scaling: Optional[str] = None,
        epsilon: float = 1e-10,
        x_col: str = "x",
    ):
        K = np.diag(np.asarray(singular_values, dtype=np.float64))
        super().__init__(
            K,
            U,
            V,
            mean_0=getattr(cov, "mean_0", None),
            mean_t=getattr(cov, "mean_t", None),
            x_col=x_col,
        )
        self.singular_values = np.asarray(singular_values, dtype=np.float64)
        self.cov = cov
        self.lagtime = lagtime
        self.scaling = scaling
        self.epsilon = epsilon

    def expectation(self, observables: np.ndarray, statistics: Optional[np.ndarray] = None,
                    lag_multiple: int = 1, observables_mean_free: bool = False,
                    statistics_mean_free: bool = False) -> np.ndarray:
        """Future expectation / time-lagged covariance prediction at a
        multiple of the estimation lagtime (reference _koopman.py:489-611):
        E[g]_{rho_n} = q^T P^{n-1} e_1 with P built from the singular triple
        and the test covariances; cov[g, f; n tau] = q^T P^{n-1} Sigma r.
        Integer ``lag_multiple`` only (fractional powers need scipy)."""
        if lag_multiple <= 0:
            raise ValueError("lag_multiple must be positive")
        observables = np.atleast_2d(np.asarray(observables, dtype=np.float64))
        if observables.shape[0] == 1:
            observables = observables.T
        dim = self.output_dimension
        S = np.diag(np.concatenate(([1.0], self.singular_values[:dim])))
        U = self.U[:, :dim]
        V = self.V[:, :dim]
        m_0, m_t = self.mean_0, self.mean_t
        cov_00, cov_tt = self.cov.cov_00, self.cov.cov_tt
        if lag_multiple == 1:
            P = S
        else:
            p = np.zeros((dim + 1, dim + 1))
            p[0, 0] = 1.0
            p[1:, 0] = U.T @ (m_t - m_0)
            p[1:, 1:] = U.T @ cov_tt @ V
            P = np.linalg.matrix_power(S @ p, lag_multiple - 1) @ S
        Q = np.zeros((observables.shape[1], dim + 1))
        if not observables_mean_free:
            Q[:, 0] = observables.T @ m_t
        Q[:, 1:] = observables.T @ cov_tt @ V
        if statistics is not None:
            statistics = np.atleast_2d(np.asarray(statistics, dtype=np.float64))
            if statistics.shape[0] == 1:
                statistics = statistics.T
            R = np.zeros((statistics.shape[1], dim + 1))
            if not statistics_mean_free:
                R[:, 0] = statistics.T @ m_0
            R[:, 1:] = statistics.T @ cov_00 @ U
            return Q @ P @ R.T
        return (Q @ P)[:, 0]

    @property
    def timescales(self) -> np.ndarray:
        """-tau / ln|sigma| with infinite timescale for sigma >= 1
        (_koopman.py:613-650)."""
        sv = np.abs(self.singular_values)
        ts = np.full(sv.shape, np.inf)
        mask = sv < 1.0
        ts[mask] = -self.lagtime / np.log(sv[mask])
        return ts

    @property
    def cumulative_kinetic_variance(self) -> np.ndarray:
        """cumsum(sigma^2)/sum(sigma^2) (_koopman.py:383-393)."""
        sq = self.singular_values**2
        return np.cumsum(sq) / np.sum(sq)

    def score(self, r: float = 2.0) -> float:
        """VAMP-r score of the fitted model: 1 + sum(sigma^r); VAMP-E
        (r='E' or inf) is evaluated from the model's OWN covariances, as
        the reference does when no test model is supplied
        (_score.py:13-118 / _koopman.py:434-487)."""
        if r == np.inf or (isinstance(r, str) and r.upper().replace("VAMP", "") == "E"):
            if self.cov is None:
                raise ValueError(
                    "VAMP-E scoring needs the fitted covariances; this model was "
                    "built without a CovarianceModel"
                )
            from deeptime_spark.decomposition.vamp import vamp_score

            return vamp_score(self, "E")
        return 1.0 + float(np.sum(np.abs(self.singular_values) ** r))
