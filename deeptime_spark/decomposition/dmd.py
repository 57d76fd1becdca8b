"""DMD / EDMD — dynamic mode decomposition family.

Reference: /root/reference/src/deeptime/decomposition/_dmd.py (DMD :58-199,
EDMD :251-334). Gramian-based formulation: the data pass computes
Phi(X)'Phi(X) and Phi(X)'Phi(Y) with the single-pass moments aggregate; the
small-matrix pseudo-inverse / eigendecomposition runs on the driver.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
from pyspark.sql import DataFrame

from deeptime_spark.base import Estimator, Model, Transformer
from deeptime_spark.covariance import Covariance
from deeptime_spark.decomposition.koopman import _project_expr


class DMDModel(Model):
    """Eigenpairs of the best-fit linear operator A with Y ~ A X."""

    def __init__(self, eigenvalues: np.ndarray, modes: np.ndarray, operator: np.ndarray):
        self.eigenvalues = eigenvalues
        self.modes = modes
        self.operator = operator

    def predict(self, x: np.ndarray) -> np.ndarray:
        return np.atleast_2d(x) @ self.operator.T


class DMD(Estimator):
    """Standard DMD via the normal-equations route: A^T = (X'X)^+ (X'Y)
    (equivalently A = Y X^+ on full-rank data; reference _dmd.py:58-199 uses
    the SVD route — same operator). One Spark job for both gramians."""

    def __init__(self, lagtime: int = 1, rank: Optional[int] = None, epsilon: float = 1e-10, x_col: str = "x"):
        super().__init__()
        self.lagtime = lagtime
        self.rank = rank
        self.epsilon = epsilon
        self.x_col = x_col

    def fit(self, df: DataFrame) -> "DMD":
        cov = Covariance(
            lagtime=self.lagtime,
            compute_c00=True,
            compute_c0t=True,
            compute_ctt=False,
            remove_data_mean=False,  # DMD operates on raw snapshots
            bessels_correction=False,
            x_col=self.x_col,
        ).fit_fetch(df)
        mxx = cov.cov_00  # raw X'X / w
        mxy = cov.cov_0t  # raw X'Y / w
        # pinv with optional rank truncation
        u, s, vt = np.linalg.svd(mxx, hermitian=True)
        r = self.rank or int(np.sum(s > self.epsilon * s[0]))
        inv = vt[:r].T @ np.diag(1.0 / s[:r]) @ u[:, :r].T
        A_T = inv @ mxy  # x_{t+1} ~ A x_t with A = (X'Y)' (X'X)^+
        A = A_T.T
        vals, vecs = np.linalg.eig(A)
        order = np.argsort(-np.abs(vals))
        self._model = DMDModel(vals[order], vecs[:, order], A)
        return self


class EDMDModel(Model, Transformer):
    """Koopman matrix K over a basis (reference _dmd.py:213-250)."""

    def __init__(self, operator: np.ndarray, eigenvalues: np.ndarray, modes: np.ndarray, basis, x_col: str = "x"):
        self.operator = operator
        self.eigenvalues = eigenvalues
        self.modes = modes
        self.basis = basis
        self.x_col = x_col

    def transform(self, df: DataFrame, out_col: str = "proj") -> DataFrame:
        """Project features onto Koopman eigenfunctions: psi(x) = modes^T phi(x)."""
        feat = self.basis(df, x_col=self.x_col, out_col="_phi") if self.basis else df.withColumn("_phi", df[self.x_col])
        W = np.real(self.modes).T
        return _project_expr(feat, W, None, "_phi", out_col).drop("_phi")


class EDMD(Estimator):
    """Extended DMD: K = (Phi(X)'Phi(X))^+ Phi(X)'Phi(Y)
    (reference _dmd.py:251-334). ``basis`` maps df -> df with a feature
    column (e.g. deeptime_spark.basis.Monomials)."""

    def __init__(self, basis: Optional[Callable] = None, lagtime: int = 1, epsilon: float = 1e-10, x_col: str = "x"):
        super().__init__()
        self.basis = basis
        self.lagtime = lagtime
        self.epsilon = epsilon
        self.x_col = x_col

    def fit(self, df: DataFrame) -> "EDMD":
        feat_col = self.x_col
        if self.basis is not None:
            df = self.basis(df, x_col=self.x_col, out_col="_phi")
            feat_col = "_phi"
        cov = Covariance(
            lagtime=self.lagtime,
            compute_c00=True,
            compute_c0t=True,
            compute_ctt=False,
            remove_data_mean=False,
            bessels_correction=False,
            x_col=feat_col,
        ).fit_fetch(df)
        u, s, vt = np.linalg.svd(cov.cov_00, hermitian=True)
        r = int(np.sum(s > self.epsilon * s[0]))
        inv = vt[:r].T @ np.diag(1.0 / s[:r]) @ u[:, :r].T
        K = inv @ cov.cov_0t
        vals, vecs = np.linalg.eig(K)
        order = np.argsort(-np.abs(vals))
        self._model = EDMDModel(K, vals[order], vecs[:, order], self.basis, x_col=self.x_col)
        return self
