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
from pyspark.sql import functions as F

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


def schatten_norm(M: np.ndarray, r: float) -> float:
    """Schatten-r norm: (sum sigma_i^r)^(1/r) (reference numeric/_norm.py)."""
    sv = np.linalg.svd(M, compute_uv=False)
    return float(np.power(np.sum(np.power(sv, r)), 1.0 / r))


def vamp_score(
    model: CovarianceKoopmanModel,
    r="VAMP2",
    covariances_test=None,
    dim: Optional[int] = None,
    epsilon: float = 1e-10,
) -> float:
    """VAMP-r / VAMP-E score, optionally against held-out test covariances
    (reference decomposition/_score.py:13-118; Wu & Noe 2020 eqns 33/30).

    With ``covariances_test`` the score is the cross-validation form:
    A = (U^T C00 U)^-1/2, B = U^T C0t V, C = (V^T Ctt V)^-1/2 and
    score = ||A B C||_r^r (+1 for the mean-removed constant function);
    VAMP-E: trace(2 K U^T C0t V - K U^T C00 U K V^T Ctt V).
    Requires an unscaled model (scaling=None) so U, V are the
    singular-function coefficients.
    """
    from deeptime_spark.numeric.eigen import spd_inv_sqrt

    if isinstance(r, str):
        rl = r.lower().replace("vamp", "")
        r = "e" if rl == "e" else float(rl)
    if model.scaling is not None:
        raise ValueError("vamp_score requires a model fitted with scaling=None")
    cov_test = covariances_test if covariances_test is not None else model.cov
    order = np.argsort(model.singular_values)[::-1][:dim]
    U = model.U[:, order]
    V = model.V[:, order]
    if r == "e":
        K = np.diag(model.singular_values[order])
        score = float(
            np.trace(
                2.0 * K @ U.T @ cov_test.cov_0t @ V
                - K @ U.T @ cov_test.cov_00 @ U @ K @ V.T @ cov_test.cov_tt @ V
            )
        )
    else:
        if r < 1:
            raise ValueError("score only for r >= 1 or r = 'E'")
        A = np.atleast_2d(spd_inv_sqrt(U.T @ cov_test.cov_00 @ U, epsilon=epsilon))
        B = np.atleast_2d(U.T @ cov_test.cov_0t @ V)
        C = np.atleast_2d(spd_inv_sqrt(V.T @ cov_test.cov_tt @ V, epsilon=epsilon))
        score = schatten_norm(A @ B @ C, r) ** r
    # mean removal drops the constant singular function: add it back
    return score + 1.0


def vamp_score_data(
    df: DataFrame, lagtime: int, dim: Optional[int] = None, r: float = 2.0, epsilon: float = 1e-6
) -> float:
    """Score directly from data (reference: _score.py:119-155)."""
    m = VAMP(lagtime=lagtime, dim=dim, epsilon=epsilon).fit(df).fetch_model()
    return m.score(r=r)


def vamp_score_cv(
    df: DataFrame,
    lagtime: int,
    n: int = 10,
    blocksize: Optional[int] = None,
    r="VAMP2",
    dim: Optional[int] = None,
    epsilon: float = 1e-6,
    random_state: int = 42,
    n_jobs: int = 4,
    x_col: str = "x",
) -> np.ndarray:
    """Cross-validated VAMP score (reference _score.py:226-319,
    McGibbon & Pande 2015): per fold, trajectory blocks of ``blocksize``
    (default lagtime) are randomly split 50/50 into train/validation;
    the model fits on train blocks and is scored against validation
    covariances. Folds run as concurrent Spark jobs through a thread pool
    (the Spark replacement for the reference's multiprocessing pool).

    Deviation: blocks are non-overlapping and lagged pairs never cross
    block boundaries (the reference's sliding blocks overlap by one lag
    window to conserve counts) — a small-bias, shuffle-free formulation.
    """
    from concurrent.futures import ThreadPoolExecutor

    from deeptime_spark.covariance import Covariance
    from deeptime_spark.operators.lag import blocksplit

    bs = blocksize or max(10 * lagtime, lagtime + 1)
    blocked = blocksplit(df, blocksize=bs, traj_col="traj_id")
    # treat (traj) blocks as pseudo-trajectories so lagging respects block
    # boundaries; block_id is already globally unique
    blocked = blocked.withColumn("_bhash", F.xxhash64("block_id")).persist()
    try:
        blocked.count()

        def one_fold(fold: int) -> float:
            is_test = F.pmod(F.xxhash64(F.col("block_id"), F.lit(random_state + fold)), F.lit(2)) == 0
            train = blocked.where(~is_test).withColumnRenamed("block_id", "_tid")
            test = blocked.where(is_test).withColumnRenamed("block_id", "_tid")
            train_t = train.drop("traj_id").withColumnRenamed("_tid", "traj_id")
            test_t = test.drop("traj_id").withColumnRenamed("_tid", "traj_id")
            model = VAMP(lagtime=lagtime, dim=dim, epsilon=epsilon, x_col=x_col).fit(train_t).fetch_model()
            cov_test = Covariance(
                lagtime=lagtime, compute_c00=True, compute_c0t=True, compute_ctt=True,
                remove_data_mean=True, x_col=x_col,
            ).fit_fetch(test_t)
            return vamp_score(model, r=r, covariances_test=cov_test, dim=dim)

        with ThreadPoolExecutor(max_workers=min(n_jobs, n)) as pool:
            scores = list(pool.map(one_fold, range(n)))
    finally:
        blocked.unpersist()
    return np.array(scores)
