"""VAMP — variational approach for Markov processes.

Reference: /root/reference/src/deeptime/decomposition/_vamp.py:19-470,
decomposition math at :168-194: half-weighted Koopman matrix
K_bar = C00^{-1/2} C0t Ctt^{-1/2}, SVD, singular functions
f = C00^{-1/2} U, g = Ctt^{-1/2} V. Covariances are one Spark aggregate;
the SVD is driver-side (d x d).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame

from deeptime_spark.base import EstimatorTransformer
from deeptime_spark.covariance import Covariance, CovarianceModel
from deeptime_spark.decomposition.koopman import CovarianceKoopmanModel
from deeptime_spark.numeric.eigen import spd_inv_split


class VAMP(EstimatorTransformer):
    """ctor mirrors reference (_vamp.py:196-260): lagtime, dim, var_cutoff,
    scaling {None, 'kinetic_map'}, epsilon."""

    def __init__(
        self,
        lagtime: int,
        dim: Optional[int] = None,
        var_cutoff: Optional[float] = None,
        scaling: Optional[str] = None,
        epsilon: float = 1e-6,
        x_col: str = "x",
    ):
        super().__init__()
        self.lagtime = lagtime
        self.dim = dim
        self.var_cutoff = var_cutoff
        self.scaling = scaling
        self.epsilon = epsilon
        self.x_col = x_col

    def fit(self, df: DataFrame) -> "VAMP":
        cov = Covariance(
            lagtime=self.lagtime,
            compute_c00=True,
            compute_c0t=True,
            compute_ctt=True,
            remove_data_mean=True,
            reversible=False,
            x_col=self.x_col,
        ).fit_fetch(df)
        self._model = self.fit_from_covariances(cov)
        return self

    def fit_from_covariances(self, cov: CovarianceModel) -> CovarianceKoopmanModel:
        """Driver-side decomposition (reference _vamp.py:168-194)."""
        L0 = spd_inv_split(cov.cov_00, epsilon=self.epsilon)
        Lt = spd_inv_split(cov.cov_tt, epsilon=self.epsilon)
        Kbar = L0.T @ cov.cov_0t @ Lt
        Uw, s, Vwt = np.linalg.svd(Kbar, full_matrices=False)
        if self.var_cutoff is not None:
            cumvar = np.cumsum(s**2) / np.sum(s**2)
            n = int(np.searchsorted(cumvar, self.var_cutoff) + 1)
        elif self.dim is not None:
            n = min(self.dim, len(s))
        else:
            n = len(s)
        s = s[:n]
        U = L0 @ Uw[:, :n]  # (d, n) left singular functions
        V = Lt @ Vwt[:n].T  # (d, n) right singular functions
        if self.scaling == "kinetic_map":
            U = U * s[None, :]
            V = V * s[None, :]
        return CovarianceKoopmanModel(
            singular_values=s,
            U=U,
            V=V,
            cov=cov,
            lagtime=self.lagtime,
            scaling=self.scaling,
            epsilon=self.epsilon,
            x_col=self.x_col,
        )


def vamp_score(model: CovarianceKoopmanModel, r: float = 2.0) -> float:
    """VAMP-r score (reference: decomposition/_score.py:13-118, fitted-model
    form): 1 + sum |sigma_i|^r."""
    return model.score(r=r)


def vamp_score_data(
    df: DataFrame, lagtime: int, dim: Optional[int] = None, r: float = 2.0, epsilon: float = 1e-6
) -> float:
    """Score directly from data (reference: _score.py:119-155)."""
    m = VAMP(lagtime=lagtime, dim=dim, epsilon=epsilon).fit(df).fetch_model()
    return m.score(r=r)
