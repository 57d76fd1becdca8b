"""Likelihood, posterior covariance, disconnected estimation."""

import numpy as np

from deeptime_spark.markov import analysis
from deeptime_spark.markov.estimation_extras import (
    error_perturbation,
    estimate_P,
    log_likelihood,
    stationary_distribution_disconnected,
    tmatrix_cov,
)


def test_log_likelihood_reference_doctest():
    T = np.array([[0.9, 0.1, 0.0], [0.5, 0.0, 0.5], [0.0, 0.1, 0.9]])
    C = np.array([[58, 7, 0], [6, 0, 4], [0, 3, 21]])
    assert abs(log_likelihood(C, T) - (-38.2808034725)) < 1e-8
    C2 = np.array([[58, 20, 0], [6, 0, 4], [0, 3, 21]])
    assert abs(log_likelihood(C2, T) - (-68.2144096814)) < 1e-8


def test_tmatrix_cov_dirichlet_moments():
    C = np.array([[10.0, 5.0], [2.0, 8.0]])
    cov = tmatrix_cov(C)
    # row 0 ~ Dirichlet(10, 5): var p_00 = a1 a2/(a0^2 (a0+1))... check
    a0 = 15.0
    var00 = 10 * (a0 - 10) / (a0**2 * (a0 + 1))
    assert abs(cov[0][0, 0] - var00) < 1e-12
    # rows independent: covariance within a row sums to ~0 against ones
    assert abs(cov[0].sum()) < 1e-12


def test_error_perturbation_scalar():
    C = np.array([[10.0, 5.0], [2.0, 8.0]])
    S = np.array([[1.0, 0.0], [0.0, 0.0]])  # sensitivity only to p_00
    sigma2 = error_perturbation(C, S)
    a0 = 15.0
    var00 = 10 * 5 / (a0**2 * (a0 + 1))
    assert abs(sigma2 - var00) < 1e-12


def test_estimate_P_disconnected_blocks():
    # two strongly connected blocks + an empty state
    C = np.zeros((5, 5))
    C[0, 1] = C[1, 0] = 10
    C[0, 0] = C[1, 1] = 5
    C[2, 3] = C[3, 2] = 4
    P = estimate_P(C, reversible=True)
    np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-10)
    assert P[4, 4] == 1.0  # empty state stays identity
    assert P[0, 2] == 0.0 and P[2, 0] == 0.0  # no cross-block probability
    # each block reversible w.r.t. its local stationary vector
    pi0 = analysis.stationary_distribution(P[:2, :2])
    np.testing.assert_allclose(pi0[:, None] * P[:2, :2], (pi0[:, None] * P[:2, :2]).T, atol=1e-8)


def test_estimate_P_partial_reversible_outflow():
    # strongly connected {0,1} with outgoing flow to absorbing 2
    C = np.array([[20.0, 10.0, 1.0], [10.0, 20.0, 0.0], [0.0, 0.0, 30.0]])
    P = estimate_P(C, reversible=True)
    np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-10)
    assert P[0, 2] > 0.0  # outgoing probability preserved
    assert P[2, 2] == 1.0


def test_stationary_distribution_disconnected():
    C = np.zeros((4, 4))
    C[0, 1] = C[1, 0] = 30  # block carrying 60 counts
    C[2, 3] = C[3, 2] = 10  # block carrying 20 counts
    P = estimate_P(C, reversible=True)
    pi = stationary_distribution_disconnected(P, C)
    np.testing.assert_allclose(pi.sum(), 1.0, atol=1e-12)
    np.testing.assert_allclose(pi[:2].sum(), 60 / 80, atol=1e-8)


def test_kl_rate_matrix_recovers_generator():
    import numpy as np

    from deeptime_spark.markov.analysis import stationary_distribution
    from deeptime_spark.markov.rate_matrix import (
        estimate_rate_matrix,
        estimate_rate_matrix_kl,
        expm,
    )

    # reversible 3-state generator
    K_true = np.array([[-1.2, 0.9, 0.3], [0.6, -1.0, 0.4], [0.1, 0.2, -0.3]])
    pi = stationary_distribution(expm(K_true, 10.0))  # stationary of the chain
    # enforce exact detailed balance of the fixture
    F_sym = 0.5 * (pi[:, None] * K_true + (pi[:, None] * K_true).T)
    K_true = F_sym / pi[:, None]
    np.fill_diagonal(K_true, 0.0)
    np.fill_diagonal(K_true, -K_true.sum(axis=1))
    dt = 0.25
    T = expm(K_true, dt)
    # equilibrium count matrix at large sample size
    C = np.round(2_000_000 * pi[:, None] * T)
    K_est = estimate_rate_matrix_kl(C, dt=dt)
    np.testing.assert_allclose(K_est, K_true, rtol=5e-2, atol=5e-3)
    # likelihood of the KL estimate beats the pseudo-generator start
    K_pseudo = estimate_rate_matrix(C, dt=dt, method="pseudo")

    def loglik(K):
        Tk = expm(K, dt)
        return float(np.sum(C * np.log(np.maximum(Tk, 1e-300))))

    assert loglik(K_est) >= loglik(K_pseudo) - 1e-6


def test_cve_rate_matrix_recovers_generator():
    import numpy as np

    from deeptime_spark.markov.analysis import stationary_distribution
    from deeptime_spark.markov.rate_matrix import estimate_rate_matrix, expm

    K_true = np.array([[-1.2, 0.9, 0.3], [0.6, -1.0, 0.4], [0.1, 0.2, -0.3]])
    pi = stationary_distribution(expm(K_true, 10.0))
    F_sym = 0.5 * (pi[:, None] * K_true + (pi[:, None] * K_true).T)
    K_true = F_sym / pi[:, None]
    np.fill_diagonal(K_true, 0.0)
    np.fill_diagonal(K_true, -K_true.sum(axis=1))
    dt = 0.25
    T = expm(K_true, dt)
    C = np.round(2_000_000 * pi[:, None] * T)
    K_est = estimate_rate_matrix(C, dt=dt, method="CVE")
    np.testing.assert_allclose(K_est, K_true, rtol=5e-2, atol=5e-3)
