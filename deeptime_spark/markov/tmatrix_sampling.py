"""Exact reversible transition-matrix posterior sampling (Gibbs).

Reference: ``sample_tmatrix``/``tmatrix_sampler``
(/root/reference/src/deeptime/markov/tools/estimation/api.py:1118-1238,
C++ sampler.h RevSampler). Implemented from the published algorithm
(Trendelkamp-Schroer, Wu, Paul, Noe: "Estimation and uncertainty of
reversible Markov models", JCP 143, 174101 (2015)): Gibbs sweeps over the
symmetric auxiliary matrix X with stationary density

    p(X | C) ∝ prod_{i<=j} x_ij^{c_ij + c_ji} / prod_i x_i^{c_i},

using a Beta draw for diagonal elements and, for off-diagonals, a
gamma-proposal Metropolis step matched to the conditional's mode/curvature
plus a log-normal random-walk step. T_ij = x_ij / x_i is reversible by
construction for every sample.

Sampling is inherently sequential per chain (driver-side numpy; n_states
is small at the MSM layer); independent chains parallelize across seeds.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _update_offdiag(v0, v1, v2, c0, c1, c2, rng) -> float:
    """One MH update of x_ij with conditional ∝ v^(c0-1) (v+v1)^-c1 (v+v2)^-c2."""

    def log_target(v, exponent):
        return exponent * np.log(v) - c1 * np.log(v + v1) - c2 * np.log(v + v2)

    # mode of the conditional: root of a v^2 + b v + c = 0
    a = c1 + c2 - c0
    b = (c1 - c0) * v2 + (c2 - c0) * v1
    c = -c0 * v1 * v2
    disc = b * b - 4.0 * a * c
    if a != 0.0 and disc >= 0.0:
        v_bar = 0.5 * (-b + np.sqrt(disc)) / a
        if v_bar > 0.0:
            # curvature-matched gamma proposal
            h = c1 / (v_bar + v1) ** 2 + c2 / (v_bar + v2) ** 2 - c0 / (v_bar * v_bar)
            k = -h * v_bar * v_bar
            theta = -1.0 / (h * v_bar)
            if k > 0.0 and theta > 0.0:
                v_new = rng.gamma(k, theta)
                if v_new > 0.0:
                    if v0 == 0.0:
                        v0 = v_new
                    else:
                        lp_new = log_target(v_new, c0 - 1.0) - ((k - 1.0) * np.log(v_new) - v_new / theta)
                        lp_old = log_target(v0, c0 - 1.0) - ((k - 1.0) * np.log(v0) - v0 / theta)
                        if lp_new - lp_old > 0 or rng.uniform() < np.exp(min(lp_new - lp_old, 0.0)):
                            v0 = v_new
    # log-normal random walk (stepsize 1); c0 exponent absorbs the Jacobian
    v_new = v0 * np.exp(rng.normal())
    if v_new > 0.0:
        if v0 == 0.0:
            v0 = v_new
        else:
            lp_new = log_target(v_new, c0)
            lp_old = log_target(v0, c0)
            if lp_new - lp_old > 0 or rng.uniform() < np.exp(min(lp_new - lp_old, 0.0)):
                v0 = v_new
    return v0


def _sweep(X: np.ndarray, C: np.ndarray, sumC: np.ndarray, support, rng) -> None:
    sumX = X.sum(axis=1)
    for i, j in support:
        if i == j:
            if C[i, i] > 0.0 and sumC[i] - C[i, i] > 0.0:
                s = rng.beta(C[i, i], sumC[i] - C[i, i])
                x_new = s / (1.0 - s) * (sumX[i] - X[i, i])
                if x_new > 0.0:
                    sumX[i] += x_new - X[i, i]
                    X[i, i] = x_new
        else:  # i < j by construction
            v1 = sumX[i] - X[i, j]
            v2 = sumX[j] - X[j, i]
            x_new = _update_offdiag(
                X[i, j], v1, v2, C[i, j] + C[j, i], sumC[i], sumC[j], rng
            )
            X[i, j] = X[j, i] = x_new
            sumX[i] = v1 + x_new
            sumX[j] = v2 + x_new
    total = X.sum()
    if total > 0:
        X /= total


def sample_tmatrix_reversible(
    C: np.ndarray,
    n_samples: int = 100,
    n_steps: Optional[int] = None,
    seed: int = 42,
    T0: Optional[np.ndarray] = None,
    return_statdist: bool = False,
):
    """Draw reversible transition matrices from the posterior given counts
    C. ``n_steps`` Gibbs sweeps between recorded samples (default
    sqrt(n_states), the reference BayesianMSM default)."""
    C = np.asarray(C, dtype=np.float64)
    n = C.shape[0]
    if n_steps is None:
        n_steps = max(int(np.sqrt(n)), 1)
    rng = np.random.default_rng(seed)
    sumC = C.sum(axis=1)
    if T0 is None:
        from deeptime_spark.markov.msm import transition_matrix_reversible

        T0, pi0 = transition_matrix_reversible(C, return_statdist=True)
    else:
        from deeptime_spark.markov.analysis import stationary_distribution

        pi0 = stationary_distribution(T0)
    X = pi0[:, None] * T0
    X = 0.5 * (X + X.T)  # enforce exact symmetry of the auxiliary matrix
    X /= X.sum()
    Csym = C + C.T
    support = [(i, j) for i in range(n) for j in range(i, n) if Csym[i, j] > 0.0 or i == j]

    samples = []
    statdists = []
    for _ in range(n_samples):
        for _ in range(n_steps):
            _sweep(X, C, sumC, support, rng)
        rowsums = X.sum(axis=1)
        T = X / rowsums[:, None]
        samples.append(T.copy())
        if return_statdist:
            statdists.append(rowsums / rowsums.sum())
    if return_statdist:
        return samples, statdists
    return samples
