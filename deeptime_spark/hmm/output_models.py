"""HMM emission models.

Reference: ``OutputModel`` / ``DiscreteOutputModel`` / ``GaussianOutputModel``
(/root/reference/src/deeptime/markov/hmm/_output_model.py:11,160,308).

Each model provides ``to_state_probability_trajectory`` (the per-frame
emission likelihood matrix used by forward-backward/viterbi — evaluated
inside the per-trajectory Arrow UDF), a sufficient-statistics layout for
the distributed E-step, and ``fit_from_stats`` (the driver M-step update).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class DiscreteOutputModel:
    """Categorical emissions: B[hidden, symbol]
    (reference _output_model.py:160-307)."""

    def __init__(self, output_probabilities: np.ndarray, prior: Optional[np.ndarray] = None):
        B = np.asarray(output_probabilities, dtype=np.float64)
        self.output_probabilities = B / B.sum(axis=1, keepdims=True)
        self.prior = prior

    @property
    def n_hidden_states(self) -> int:
        return self.output_probabilities.shape[0]

    @property
    def n_observable_states(self) -> int:
        return self.output_probabilities.shape[1]

    def to_state_probability_trajectory(self, obs: np.ndarray) -> np.ndarray:
        """pobs[t, i] = B[i, obs[t]] (reference :231-244)."""
        return self.output_probabilities.T[np.asarray(obs, dtype=np.int64)]

    # -- distributed E-step plumbing -----------------------------------
    def stats_dim(self) -> int:
        return self.n_hidden_states * self.n_observable_states

    def collect_stats(self, obs: np.ndarray, gamma: np.ndarray) -> np.ndarray:
        """sum_t gamma[t, i] * onehot(obs[t]) -> flattened (N, M)."""
        N, M = self.output_probabilities.shape
        out = np.zeros((N, M))
        np.add.at(out.T, np.asarray(obs, dtype=np.int64), gamma)
        return out.ravel()

    def fit_from_stats(self, stats: np.ndarray) -> None:
        """M-step: row-normalized gamma-weighted symbol counts
        (reference fit, :268-293)."""
        N, M = self.output_probabilities.shape
        counts = stats.reshape(N, M)
        if self.prior is not None:
            counts = counts + self.prior
        rowsum = counts.sum(axis=1, keepdims=True)
        rowsum[rowsum == 0.0] = 1.0
        self.output_probabilities = counts / rowsum

    def copy(self) -> "DiscreteOutputModel":
        return DiscreteOutputModel(self.output_probabilities.copy(), prior=self.prior)

    def sample_observation(self, state: int, rng) -> int:
        return int(rng.choice(self.n_observable_states, p=self.output_probabilities[state]))


class GaussianOutputModel:
    """1-d Gaussian emissions per hidden state: N(means[i], sigmas[i]^2)
    (reference _output_model.py:308-473)."""

    def __init__(self, n_states: int, means=None, sigmas=None):
        self.means = np.zeros(n_states) if means is None else np.asarray(means, dtype=np.float64)
        self.sigmas = np.ones(n_states) if sigmas is None else np.asarray(sigmas, dtype=np.float64)

    @property
    def n_hidden_states(self) -> int:
        return len(self.means)

    def to_state_probability_trajectory(self, obs: np.ndarray) -> np.ndarray:
        obs = np.asarray(obs, dtype=np.float64)
        diff = obs[:, None] - self.means[None, :]
        var = self.sigmas[None, :] ** 2
        p = np.exp(-0.5 * diff * diff / var) / np.sqrt(2.0 * np.pi * var)
        return np.maximum(p, 1e-300)

    def stats_dim(self) -> int:
        return 3 * self.n_hidden_states

    def collect_stats(self, obs: np.ndarray, gamma: np.ndarray) -> np.ndarray:
        """(sum gamma, sum gamma*x, sum gamma*x^2) per hidden state."""
        obs = np.asarray(obs, dtype=np.float64)
        w = gamma.sum(axis=0)
        wx = gamma.T @ obs
        wxx = gamma.T @ (obs * obs)
        return np.concatenate([w, wx, wxx])

    def fit_from_stats(self, stats: np.ndarray) -> None:
        """M-step: weighted mean/std per state (reference fit, :430-460)."""
        N = self.n_hidden_states
        w, wx, wxx = stats[:N], stats[N : 2 * N], stats[2 * N :]
        w_safe = np.where(w > 0, w, 1.0)
        mean = wx / w_safe
        var = np.maximum(wxx / w_safe - mean * mean, 1e-12)
        self.means = np.where(w > 0, mean, self.means)
        self.sigmas = np.where(w > 0, np.sqrt(var), self.sigmas)

    def copy(self) -> "GaussianOutputModel":
        return GaussianOutputModel(self.n_hidden_states, self.means.copy(), self.sigmas.copy())

    def sample_observation(self, state: int, rng) -> float:
        return float(rng.normal(self.means[state], self.sigmas[state]))
