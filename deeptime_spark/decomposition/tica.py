"""TICA — time-lagged independent component analysis.

Reference: /root/reference/src/deeptime/decomposition/_tica.py:13-223
(decomposition at :139-164): reversible (symmetrized) covariances, then the
generalized symmetric eigenproblem C0t r = C00 lambda r. The data-volume
work (one covariance pass) runs as a single Spark aggregate; the (d x d)
eigenproblem is driver-side numpy.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame

from deeptime_spark.base import EstimatorTransformer
from deeptime_spark.covariance import Covariance, CovarianceModel
from deeptime_spark.decomposition.koopman import CovarianceKoopmanModel
from deeptime_spark.numeric.eigen import eig_corr


class TICA(EstimatorTransformer):
    """ctor mirrors the reference (lagtime, dim, var_cutoff, scaling,
    epsilon; _tica.py:60-120). ``fit`` = one Spark job; ``transform``
    projects frames onto the independent components (executor-side codegen).
    """

    def __init__(
        self,
        lagtime: int,
        dim: Optional[int] = None,
        var_cutoff: Optional[float] = None,
        scaling: Optional[str] = "kinetic_map",
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

    def fit(self, df: DataFrame) -> "TICA":
        cov = Covariance(
            lagtime=self.lagtime,
            compute_c00=True,
            compute_c0t=True,
            compute_ctt=True,
            remove_data_mean=True,
            reversible=True,  # TICA symmetrizes (reference _tica.py:139-146)
            x_col=self.x_col,
        ).fit_fetch(df)
        self._model = self.fit_from_covariances(cov)
        return self

    def fit_from_covariances(self, cov: CovarianceModel) -> CovarianceKoopmanModel:
        """Driver-side decomposition (reference _tica.py:139-164)."""
        eigenvalues, R = eig_corr(cov.cov_00, cov.cov_0t, epsilon=self.epsilon)
        if self.var_cutoff is not None:
            cumvar = np.cumsum(eigenvalues**2) / np.sum(eigenvalues**2)
            n = int(np.searchsorted(cumvar, self.var_cutoff) + 1)
        elif self.dim is not None:
            n = min(self.dim, len(eigenvalues))
        else:
            n = len(eigenvalues)
        eigenvalues, R = eigenvalues[:n], R[:, :n]
        if self.scaling == "kinetic_map":
            # projections scaled by eigenvalues -> euclidean distances are
            # kinetic distances (_tica.py:104-110)
            proj = R * eigenvalues[None, :]
        elif self.scaling == "commute_map":
            # reference _tica.py:152-159: regularized timescales damped by
            # tanh so processes faster than the lagtime are suppressed
            timescales = 1.0 - self.lagtime / np.log(np.abs(eigenvalues))
            regularized = 0.5 * timescales * np.maximum(
                np.tanh(np.pi * ((timescales - self.lagtime) / self.lagtime) + 1), 0
            )
            proj = R * np.sqrt(regularized / 2)
        else:
            proj = R
        return CovarianceKoopmanModel(
            singular_values=eigenvalues,
            U=proj,
            V=proj,
            cov=cov,
            lagtime=self.lagtime,
            scaling=self.scaling,
            epsilon=self.epsilon,
            x_col=self.x_col,
        )
