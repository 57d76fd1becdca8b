"""Deterministic fixture generators with closed-form oracles.

These are *test oracles*, mirroring the reference's strategy of analytic
fixtures (SURVEY.md §5): BirthDeathChain
(/root/reference/src/deeptime/data/_birth_death_chain.py:5) has exact
stationary distribution / committors / MFPT; ``tmatrix_metropolis1d``
(/root/reference/src/deeptime/data/_datasets.py:300) builds Metropolis
transition matrices from 1-d energies; the linear Koopman system mirrors
tests/decomposition/test_vamp.py:64-89. All math implemented from the
published definitions (detailed balance, Metropolis rule), not copied.
"""

from __future__ import annotations

import numpy as np


class BirthDeathChain:
    """Birth-death Markov chain on {0..n-1} with exact analytics.

    p[i] = P(i -> i+1), q[i] = P(i -> i-1), r[i] = 1 - p[i] - q[i].
    Requires q[0] = 0 and p[n-1] = 0. Detailed balance gives the stationary
    weights w[0]=1, w[i] = w[i-1] * p[i-1]/q[i] — the standard closed form
    for reversible birth-death processes.
    """

    def __init__(self, q, p):
        q = np.asarray(q, dtype=np.float64)
        p = np.asarray(p, dtype=np.float64)
        if q[0] != 0.0 or p[-1] != 0.0:
            raise ValueError("require q[0]=0 and p[-1]=0")
        if np.any(p + q > 1.0 + 1e-12):
            raise ValueError("p+q must be <= 1 per state")
        self.q, self.p = q, p
        self.n = len(p)

    @property
    def transition_matrix(self) -> np.ndarray:
        n = self.n
        T = np.zeros((n, n))
        for i in range(n):
            if i > 0:
                T[i, i - 1] = self.q[i]
            if i < n - 1:
                T[i, i + 1] = self.p[i]
            T[i, i] = 1.0 - self.p[i] - self.q[i]
        return T

    @property
    def stationary_distribution(self) -> np.ndarray:
        w = np.ones(self.n)
        for i in range(1, self.n):
            w[i] = w[i - 1] * self.p[i - 1] / self.q[i]
        return w / w.sum()

    def committor_forward(self, a: int, b: int) -> np.ndarray:
        """q+(i) = P(hit b before a | start i); closed form via the
        harmonic-function recursion for birth-death chains."""
        # u[i] = sum_{k=a..i-1} prod_{j=a+1..k} q[j]/p[j]; q+ = u/u[b]
        n = self.n
        ratios = np.ones(n)
        for k in range(a + 1, n - 1):
            ratios[k] = ratios[k - 1] * self.q[k] / self.p[k]
        qplus = np.zeros(n)
        acc = 0.0
        partial = np.zeros(n)
        for i in range(a + 1, b + 1):
            acc += ratios[i - 1] if i - 1 >= a else 0.0
            partial[i] = acc
        denom = partial[b]
        for i in range(n):
            if i <= a:
                qplus[i] = 0.0 if i == a else 0.0
            elif i >= b:
                qplus[i] = 1.0
            else:
                qplus[i] = partial[i] / denom
        qplus[b:] = 1.0
        qplus[: a + 1] = 0.0
        qplus[b] = 1.0
        return qplus


def simulate_msm(T: np.ndarray, n_steps: int, start: int = 0, seed: int = 42) -> np.ndarray:
    """Sample a dtraj from transition matrix T (inverse-CDF per step).

    Equivalent of MarkovStateModel.simulate
    (/root/reference/src/deeptime/markov/msm/_markov_state_model.py:1014).
    """
    rng = np.random.default_rng(seed)
    cdf = np.cumsum(T, axis=1)
    out = np.empty(n_steps, dtype=np.int32)
    s = start
    us = rng.random(n_steps)
    for i in range(n_steps):
        out[i] = s
        s = int(np.searchsorted(cdf[s], us[i]))
    return out


def tmatrix_metropolis1d(energies, d: float = 1.0) -> np.ndarray:
    """Metropolis rule on a 1-d energy landscape -> transition matrix
    (reference: data/_datasets.py:300-347). p(i->j) = d*min(1, e^{-(E_j-E_i)})
    for neighbors j, self-loop absorbs the rest."""
    E = np.asarray(energies, dtype=np.float64)
    n = len(E)
    T = np.zeros((n, n))
    for i in range(n):
        if i > 0:
            T[i, i - 1] = d * min(1.0, np.exp(-(E[i - 1] - E[i])))
        if i < n - 1:
            T[i, i + 1] = d * min(1.0, np.exp(-(E[i + 1] - E[i])))
        T[i, i] = 1.0 - T[i].sum()
    return T


def double_well_discrete_tmatrix(n_states: int = 100) -> np.ndarray:
    """Double-well energy landscape -> Metropolis T-matrix (the reference's
    standard MSM scenario, FIXTURES.md F2b)."""
    xs = np.linspace(-1.8, 1.8, n_states)
    energies = xs**4 - 2.5 * xs**2  # two wells, barrier at 0
    return tmatrix_metropolis1d(energies, d=0.45)


def linear_koopman_system(
    d: int = 8, n_steps: int = 5000, noise: float = 1e-3, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """Linear system x_{t+1} = K^T x_t + eps with known operator K.

    Mirrors tests/decomposition/test_vamp.py:64-89: K orthogonal-similar to
    diag(k/d), so VAMP/TICA must recover its spectrum. Returns (traj, K).
    """
    rng = np.random.default_rng(seed)
    eigs = np.arange(1, d + 1) / (d + 1)
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    K = Q @ np.diag(eigs) @ Q.T
    X = np.empty((n_steps, d))
    X[0] = rng.normal(size=d)
    for i in range(1, n_steps):
        X[i] = K.T @ X[i - 1] + noise * rng.normal(size=d)
    return X, K
