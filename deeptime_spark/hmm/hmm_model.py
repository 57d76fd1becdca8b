"""Hidden Markov model + the sequential per-trajectory kernels.

Reference: ``HiddenMarkovModel``
(/root/reference/src/deeptime/markov/hmm/_hidden_markov_model.py:14-1078),
``viterbi`` (:1055), C++ forward/backward (hmm/_hmm_bindings utils).

``forward_backward``/``viterbi`` are the numpy kernels executed *inside*
per-trajectory Arrow UDFs (sequential per series, parallel across series —
SURVEY.md §2.9's designed Spark shape). The model object itself is
driver-side; its DataFrame methods emit distributed transforms.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def forward_backward(A: np.ndarray, pobs: np.ndarray, pi: np.ndarray):
    """Scaled forward-backward pass over one observation sequence.

    Returns (loglik, gamma, counts): gamma[t, i] = P(s_t = i | obs) and
    counts = sum_t xi(t), the Baum-Welch transition counts. Mirrors the
    reference C++ ``_util.forward_backward`` semantics (scaling per frame,
    loglik = sum log scale).
    """
    T, N = pobs.shape
    alpha = np.zeros((T, N))
    scale = np.zeros(T)
    alpha[0] = pi * pobs[0]
    scale[0] = max(alpha[0].sum(), 1e-300)
    alpha[0] /= scale[0]
    for t in range(1, T):
        alpha[t] = (alpha[t - 1] @ A) * pobs[t]
        scale[t] = max(alpha[t].sum(), 1e-300)
        alpha[t] /= scale[t]
    beta = np.zeros((T, N))
    beta[T - 1] = 1.0
    for t in range(T - 2, -1, -1):
        beta[t] = (A @ (pobs[t + 1] * beta[t + 1])) / scale[t + 1]
    gamma = alpha * beta
    gamma_sum = gamma.sum(axis=1, keepdims=True)
    gamma_sum[gamma_sum == 0.0] = 1.0
    gamma /= gamma_sum
    # counts = A .* (alpha[:-1]^T @ (pobs[1:] * beta[1:] / scale[1:]))
    if T > 1:
        weighted = pobs[1:] * beta[1:] / scale[1:, None]
        counts = A * (alpha[:-1].T @ weighted)
    else:
        counts = np.zeros((N, N))
    loglik = float(np.sum(np.log(scale)))
    return loglik, gamma, counts


def viterbi(A: np.ndarray, pobs: np.ndarray, pi: np.ndarray) -> np.ndarray:
    """Most likely hidden path (log-space DP; reference
    _hidden_markov_model.py:1055-1078)."""
    T, N = pobs.shape
    with np.errstate(divide="ignore"):
        logA = np.log(A)
        logp = np.log(np.maximum(pobs, 1e-300))
        delta = np.log(np.maximum(pi, 1e-300)) + logp[0]
    ptr = np.zeros((T, N), dtype=np.int64)
    for t in range(1, T):
        cand = delta[:, None] + logA
        ptr[t] = np.argmax(cand, axis=0)
        delta = cand[ptr[t], np.arange(N)] + logp[t]
    path = np.zeros(T, dtype=np.int64)
    path[T - 1] = int(np.argmax(delta))
    for t in range(T - 2, -1, -1):
        path[t] = ptr[t + 1][path[t + 1]]
    return path


class HiddenMarkovModel:
    """Hidden transition model + output model + initial distribution
    (reference _hidden_markov_model.py:14-1078)."""

    def __init__(
        self,
        transition_model,
        output_model,
        initial_distribution: Optional[np.ndarray] = None,
        likelihoods: Optional[np.ndarray] = None,
        initial_count: Optional[np.ndarray] = None,
        stride: int = 1,
    ):
        self.transition_model = transition_model
        self.output_model = output_model
        n = output_model.n_hidden_states
        self.initial_distribution = (
            np.full(n, 1.0 / n) if initial_distribution is None else np.asarray(initial_distribution)
        )
        self.likelihoods = likelihoods
        self.initial_count = initial_count
        self.stride = stride

    @property
    def n_hidden_states(self) -> int:
        return self.output_model.n_hidden_states

    @property
    def transition_matrix(self) -> np.ndarray:
        return self.transition_model.transition_matrix

    @property
    def stationary_distribution(self) -> np.ndarray:
        return self.transition_model.stationary_distribution

    def lifetimes(self) -> np.ndarray:
        """Expected residence time per hidden state -tau/ln T_ii
        (reference :engine parity)."""
        with np.errstate(divide="ignore"):
            return -self.transition_model.lagtime / np.log(np.diag(self.transition_matrix))

    def timescales(self, k: Optional[int] = None) -> np.ndarray:
        return self.transition_model.timescales(k)

    # ------------------------------------------------------- DataFrame API

    def _per_traj_udf(self, kind: str, obs_col: str):
        A = self.transition_matrix
        pi = self.initial_distribution
        om = self.output_model

        if kind == "gamma":
            schema = StructType(
                [
                    StructField("traj_id", LongType()),
                    StructField("t", LongType()),
                    StructField("state_probabilities", ArrayType(DoubleType())),
                ]
            )

            def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values("t")
                pobs = om.to_state_probability_trajectory(pdf[obs_col].to_numpy())
                _, gamma, _ = forward_backward(A, pobs, pi)
                return pd.DataFrame(
                    {
                        "traj_id": pdf["traj_id"].to_numpy(),
                        "t": pdf["t"].to_numpy(),
                        "state_probabilities": list(gamma),
                    }
                )

        elif kind == "viterbi":
            schema = StructType(
                [
                    StructField("traj_id", LongType()),
                    StructField("t", LongType()),
                    StructField("hidden_state", IntegerType()),
                ]
            )

            def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values("t")
                pobs = om.to_state_probability_trajectory(pdf[obs_col].to_numpy())
                path = viterbi(A, pobs, pi)
                return pd.DataFrame(
                    {
                        "traj_id": pdf["traj_id"].to_numpy(),
                        "t": pdf["t"].to_numpy(),
                        "hidden_state": path.astype(np.int32),
                    }
                )

        else:
            raise ValueError(kind)
        return fn, schema

    def state_probabilities_df(self, df: DataFrame, obs_col: str = "state") -> DataFrame:
        """gamma per frame: grouped-map Arrow UDF per trajectory (the
        reference's `transform(..., 'sfull')`)."""
        fn, schema = self._per_traj_udf("gamma", obs_col)
        return df.select("traj_id", "t", obs_col).groupBy("traj_id").applyInPandas(fn, schema=schema)

    def viterbi_df(self, df: DataFrame, obs_col: str = "state") -> DataFrame:
        """Most likely hidden path per trajectory."""
        fn, schema = self._per_traj_udf("viterbi", obs_col)
        return df.select("traj_id", "t", obs_col).groupBy("traj_id").applyInPandas(fn, schema=schema)

    def transform(self, df: DataFrame, obs_col: str = "state") -> DataFrame:
        return self.state_probabilities_df(df, obs_col)

    def simulate(self, n_steps: int, start: Optional[int] = None, seed: int = 42):
        """Generate (hidden, observed) trajectories (reference :simulate)."""
        rng = np.random.default_rng(seed)
        n = self.n_hidden_states
        s = int(rng.choice(n, p=self.initial_distribution)) if start is None else start
        hidden = np.zeros(n_steps, dtype=np.int64)
        obs = []
        for t in range(n_steps):
            hidden[t] = s
            obs.append(self.output_model.sample_observation(s, rng))
            s = int(rng.choice(n, p=self.transition_matrix[s]))
        return hidden, np.array(obs)
