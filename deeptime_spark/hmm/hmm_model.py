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


def _pad_pobs(pobs_list: list) -> tuple[np.ndarray, np.ndarray]:
    """Stack variable-length (T_i, N) sequences into a (B, T_max, N) array
    padded with 1.0. With unit emission probabilities the scaled recursions
    propagate through the padding as exact no-ops (row-stochastic A keeps
    beta at 1, scales at ~1), so one vectorized time loop serves the whole
    batch; masked reductions discard the padded frames."""
    lengths = np.array([p.shape[0] for p in pobs_list], dtype=np.int64)
    B, T, N = len(pobs_list), int(lengths.max()), pobs_list[0].shape[1]
    pobs = np.ones((B, T, N))
    for b, p in enumerate(pobs_list):
        pobs[b, : len(p)] = p
    return pobs, lengths


def forward_backward_batch(A: np.ndarray, pobs_list: list, pi: np.ndarray):
    """Batched scaled forward-backward: one time loop vectorized across a
    batch of sequences (the per-step work becomes (B, N) x (N, N) BLAS
    instead of B separate length-T Python loops — the difference between
    ~10 us/frame interpreter overhead and ~ns/frame).

    Returns (loglik_total, gamma0_sum, counts_sum, gamma_list): totals are
    summed over the batch (Baum-Welch sufficient statistics are additive);
    gamma_list keeps per-sequence posteriors for output-model stats.
    """
    pobs, lengths = _pad_pobs(pobs_list)
    B, T, N = pobs.shape
    alpha = np.empty((B, T, N))
    scale = np.ones((B, T))
    a = pi[None, :] * pobs[:, 0]
    s = np.maximum(a.sum(axis=1), 1e-300)
    alpha[:, 0] = a / s[:, None]
    scale[:, 0] = s
    for t in range(1, T):
        a = (alpha[:, t - 1] @ A) * pobs[:, t]
        s = np.maximum(a.sum(axis=1), 1e-300)
        alpha[:, t] = a / s[:, None]
        scale[:, t] = s
    beta = np.empty((B, T, N))
    beta[:, T - 1] = 1.0
    for t in range(T - 2, -1, -1):
        beta[:, t] = ((pobs[:, t + 1] * beta[:, t + 1]) @ A.T) / scale[:, t + 1, None]
    gamma = alpha * beta
    gsum = gamma.sum(axis=2, keepdims=True)
    gsum[gsum == 0.0] = 1.0
    gamma /= gsum
    t_idx = np.arange(T)
    valid = t_idx[None, :] < lengths[:, None]  # (B, T)
    if T > 1:
        weighted = pobs[:, 1:] * beta[:, 1:] / scale[:, 1:, None]
        # xi(t) exists for t in [0, len-2]: mask padded tail transitions
        weighted *= (t_idx[None, 1:] < lengths[:, None])[:, :, None]
        counts_sum = A * np.einsum("bti,btj->ij", alpha[:, :-1], weighted)
    else:
        counts_sum = np.zeros((N, N))
    loglik = float(np.sum(np.log(scale), where=valid))
    gamma0_sum = gamma[:, 0].sum(axis=0)
    gamma_list = [gamma[b, : lengths[b]] for b in range(B)]
    return loglik, gamma0_sum, counts_sum, gamma_list


def viterbi_batch(A: np.ndarray, pobs_list: list, pi: np.ndarray) -> list:
    """Batched log-space Viterbi: vectorized time loop + vectorized
    backtrack. Padded frames get identity backpointers so every path can be
    traced from the common last frame; the per-sequence terminal scores are
    checkpointed at each true last frame."""
    pobs, lengths = _pad_pobs(pobs_list)
    B, T, N = pobs.shape
    with np.errstate(divide="ignore"):
        logA = np.log(A)
        logp = np.log(np.maximum(pobs, 1e-300))
        delta = np.log(np.maximum(pi, 1e-300))[None, :] + logp[:, 0]
    ptr = np.zeros((B, T, N), dtype=np.int32)
    ident = np.arange(N, dtype=np.int32)
    final_delta = np.empty((B, N))
    sel0 = lengths == 1
    final_delta[sel0] = delta[sel0]
    for t in range(1, T):
        cand = delta[:, :, None] + logA[None, :, :]  # (B, from, to)
        ptr_t = cand.argmax(axis=1).astype(np.int32)  # (B, to)
        pad = lengths <= t
        ptr_t[pad] = ident
        ptr[:, t] = ptr_t
        delta = cand.max(axis=1) + logp[:, t]
        sel = lengths - 1 == t
        if sel.any():
            final_delta[sel] = delta[sel]
    path = np.empty((B, T), dtype=np.int64)
    path[:, T - 1] = final_delta.argmax(axis=1)
    rows = np.arange(B)
    for t in range(T - 2, -1, -1):
        path[:, t] = ptr[rows, t + 1, path[:, t + 1]]
    return [path[b, : lengths[b]] for b in range(B)]


def _partition_groups(batches, obs_col: str):
    """Materialize one mapInPandas partition and split it into
    per-trajectory (traj_id, t_array, obs_array) groups (rows of a
    trajectory are co-located by the upstream repartition)."""
    pdfs = [p for p in batches]
    if not pdfs:
        return None
    pdf = pd.concat(pdfs, ignore_index=True).sort_values(["traj_id", "t"])
    traj = pdf["traj_id"].to_numpy()
    bounds = np.flatnonzero(np.r_[True, traj[1:] != traj[:-1]])
    ts = pdf["t"].to_numpy()
    obs = pdf[obs_col].to_numpy()
    ends = np.r_[bounds[1:], len(traj)]
    return [(traj[b], ts[b:e], obs[b:e]) for b, e in zip(bounds, ends)]


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

    def _decode_df(
        self, df: DataFrame, kind: str, obs_col: str, colocated: bool = False
    ) -> DataFrame:
        """Partition-batched decode: co-locate trajectories by hash
        repartition, then one mapInPandas pass runs the batched recursion
        over every trajectory in the partition at once (one vectorized time
        loop per partition instead of a Python loop per frame)."""
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
        else:
            schema = StructType(
                [
                    StructField("traj_id", LongType()),
                    StructField("t", LongType()),
                    StructField("hidden_state", IntegerType()),
                ]
            )

        def fn(batches):
            groups = _partition_groups(batches, obs_col)
            if not groups:
                return
            pobs_list = [om.to_state_probability_trajectory(o) for _, _, o in groups]
            if kind == "gamma":
                _, _, _, gammas = forward_backward_batch(A, pobs_list, pi)
                yield pd.DataFrame(
                    {
                        "traj_id": np.concatenate([np.full(len(t), tid) for tid, t, _ in groups]),
                        "t": np.concatenate([t for _, t, _ in groups]),
                        "state_probabilities": [g for gam in gammas for g in gam],
                    }
                )
            else:
                paths = viterbi_batch(A, pobs_list, pi)
                yield pd.DataFrame(
                    {
                        "traj_id": np.concatenate([np.full(len(t), tid) for tid, t, _ in groups]),
                        "t": np.concatenate([t for _, t, _ in groups]),
                        "hidden_state": np.concatenate(paths).astype(np.int32),
                    }
                )

        out = df.select("traj_id", "t", obs_col)
        if not colocated:
            # pin parallelism: AQE coalescing would serialize the decode
            out = out.repartition(
                df.sparkSession.sparkContext.defaultParallelism, "traj_id"
            )
        return out.mapInPandas(fn, schema=schema)

    def state_probabilities_df(self, df: DataFrame, obs_col: str = "state") -> DataFrame:
        """gamma per frame: batched forward-backward per partition (the
        reference's `transform(..., 'sfull')`)."""
        return self._decode_df(df, "gamma", obs_col)

    def viterbi_df(
        self, df: DataFrame, obs_col: str = "state", colocated: bool = False
    ) -> DataFrame:
        """Most likely hidden path per trajectory. ``colocated=True`` skips
        the repartition when the caller's frame is already hash-partitioned
        by traj_id (e.g. persisted upstream of an EM fit)."""
        return self._decode_df(df, "viterbi", obs_col, colocated=colocated)

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
