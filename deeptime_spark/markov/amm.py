"""Augmented Markov models (AMM) — MSMs biased toward experimental data.

Reference: ``AugmentedMSMEstimator``/``AugmentedMSM``
(/root/reference/src/deeptime/markov/msm/_augmented_msm.py:1-613).
Implemented from the published method (Olsson, Wu, Paul, Clementi, Noe:
"Combining experimental and simulation data of molecular processes via
augmented Markov models", PNAS 114 (2017) 8265, SI equations):

- biased stationary estimate  pi_hat_i ∝ pi_i exp(sum_k lambda_k E_ik)
- Lagrange gradient           dl = 2 G w (m_hat - m_exp)
- reversible X fixed point with the Q-correction
  X_ij = (C + C^T)_ij / (c_i/pi_i + c_j/pi_j + Q_ij).

Counting runs on Spark upstream; the optimizer is driver-side (n x n with
K observables — small by construction).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from deeptime_spark.base import Estimator
from deeptime_spark.markov.estimation_extras import log_likelihood
from deeptime_spark.markov.msm import (
    MarkovStateModel,
    transition_matrix_reversible,
)
from deeptime_spark.markov.transition_counting import TransitionCountModel


class AugmentedMSM(MarkovStateModel):
    """MSM + the AMM optimizer summary (reference :179-205)."""

    def __init__(self, transition_matrix, stationary_distribution, count_model,
                 lagrange, m_hat, log_likelihoods, lagtime=1):
        super().__init__(transition_matrix, stationary_distribution=stationary_distribution,
                         reversible=True, lagtime=lagtime, count_model=count_model)
        self.lagrange = lagrange
        self.m_hat = m_hat
        self.log_likelihoods = log_likelihoods


class AugmentedMSMEstimator(Estimator):
    """ctor mirrors the reference (:206-280): expectations_by_state (n, K),
    experimental_measurements (K,), measurement weights (K,)."""

    def __init__(self, expectations_by_state, experimental_measurements,
                 experimental_measurement_weights, maxiter: int = 500, ll_tol: float = 1e-8):
        super().__init__()
        self.E = np.atleast_2d(np.asarray(expectations_by_state, dtype=np.float64))
        if self.E.shape[0] == 1 and self.E.shape[1] > 1:
            self.E = self.E.T  # (n, K)
        self.m_exp = np.atleast_1d(np.asarray(experimental_measurements, dtype=np.float64))
        self.w = np.atleast_1d(np.asarray(experimental_measurement_weights, dtype=np.float64))
        self.maxiter = maxiter
        self.ll_tol = ll_tol

    def fit(self, counts: TransitionCountModel) -> "AugmentedMSMEstimator":
        sub = counts.submodel_largest(directed=True)
        C = np.asarray(sub.count_matrix, dtype=np.float64)
        E = self.E[sub.state_symbols] if self.E.shape[0] != C.shape[0] else self.E
        n, K = E.shape
        Csym = C + C.T
        c_row = C.sum(axis=1)
        T0, pi = transition_matrix_reversible(C, return_statdist=True)
        lam = np.zeros(K)
        lls = [log_likelihood(C, T0)]

        def pi_hat_of(lam, pi):
            expons = E @ lam
            expons -= expons.max()
            p = pi * np.exp(expons)
            return p / p.sum()

        def solve_X(pi_hat, pi, m_hat, slope):
            """Q-corrected reversible X update (SI eq.):
            R_ij^k = E_ik pi_hat_j + E_jk pi_hat_i - (pi_hat_i + pi_hat_j) m_hat_k,
            X_ij = Csym_ij / (c_i/pi_i + c_j/pi_j - 2 sum_k w_k slope_k R_ij^k)."""
            pek = pi_hat[:, None] * E
            pp = pi_hat[:, None] + pi_hat[None, :]
            Q = np.zeros((n, n))
            for k in range(K):
                Rk = pek[:, k][:, None] + pek[:, k][None, :] - pp * m_hat[k]
                Q += self.w[k] * slope[k] * Rk
            Q *= -2.0
            with np.errstate(divide="ignore", invalid="ignore"):
                c_over_pi = c_row / pi
                D = c_over_pi[:, None] + c_over_pi[None, :] + Q
                X = np.where(Csym > 0, Csym / D, 0.0)
            return X

        pi_hat = pi_hat_of(lam, pi)
        X = None
        ll_prev = lls[0]
        for _ in range(self.maxiter):
            m_hat = pi_hat @ E
            slope = m_hat - self.m_exp
            G = (E.T * pi_hat) @ E - np.outer(m_hat, m_hat)  # observable covariance
            dl = 2.0 * (G @ (self.w * slope))
            # Lagrange step constrained by strictly improving the AMM
            # likelihood (reference _newton_lagrange backtracking)
            frac = 1.0
            accepted = False
            while frac >= 1e-10:
                lam_try = lam - frac * dl
                pi_hat_try = pi_hat_of(lam_try, pi)
                if np.any(pi_hat_try < 1e-12):
                    frac *= 0.5
                    continue
                m_try = pi_hat_try @ E
                slope_try = m_try - self.m_exp
                X_try = solve_X(pi_hat_try, pi, m_try, slope_try)
                if np.any(X_try < 0) or X_try.sum() <= 0:
                    frac *= 0.1
                    continue
                X_try = X_try / X_try.sum()
                pi_try = X_try.sum(axis=1)
                T_try = X_try / pi_try[:, None]
                ll_try = log_likelihood(C, T_try) - float(np.sum(self.w * slope_try**2))
                if ll_try > ll_prev or frac < 1e-9:
                    lam, pi_hat = lam_try, pi_hat_try
                    X, pi = X_try, pi_try
                    lls.append(ll_try)
                    accepted = True
                    break
                frac *= 0.1
            if not accepted:
                break
            if abs(lls[-1] - ll_prev) < self.ll_tol:
                ll_prev = lls[-1]
                break
            ll_prev = lls[-1]
            pi_hat = pi_hat_of(lam, pi)
        if X is None:
            X = solve_X(pi_hat, pi, pi_hat @ E, pi_hat @ E - self.m_exp)
            X /= X.sum()
            pi = X.sum(axis=1)
        T = X / pi[:, None]
        self._model = AugmentedMSM(
            T, stationary_distribution=pi / pi.sum(), count_model=sub,
            lagrange=lam, m_hat=pi_hat @ E, log_likelihoods=np.array(lls),
            lagtime=sub.lagtime,
        )
        return self
