"""Maximum likelihood HMM estimation (distributed Baum-Welch).

Reference: ``MaximumLikelihoodHMM``
(/root/reference/src/deeptime/markov/hmm/_maximum_likelihood_hmm.py:16-424).

Spark shape (SURVEY.md §2.9): per EM iteration, ONE Spark job runs the
E-step — a grouped-map Arrow UDF per (lagged/strided) sub-trajectory that
executes the scaled forward-backward recursion sequentially and emits a
single sufficient-statistics row (loglik, gamma_0, Baum-Welch counts,
output-model stats). The driver sums the ~|trajs| rows and performs the
M-step (reversible MLE reuse + emission refit). Sequences stay distributed;
only O(n_hidden^2 + stats_dim) floats per trajectory cross the wire.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from deeptime_spark.base import Estimator
from deeptime_spark.hmm.hmm_model import HiddenMarkovModel
from deeptime_spark.markov.msm import (
    MarkovStateModel,
    transition_matrix_nonreversible,
    transition_matrix_reversible,
    transition_matrix_reversible_fixed_pi,
)
from deeptime_spark.markov.transition_counting import TransitionCountModel


def lag_observations_df(
    df: DataFrame, lag: int, stride: int = 1, traj_col: str = "traj_id", time_col: str = "t"
) -> DataFrame:
    """Interleaved lagged sub-trajectories (reference ``lag_observations``,
    markov/_util.py:108-137): trajectory (s0, s1, ...) at lag 3 becomes
    (s0, s3, ...), (s1, s4, ...), (s2, s5, ...) — sub-sampled at the lag
    but shifted, so an MLE at lag > 1 discards no data.

    Pure column math: sub_traj = traj_id * lag + (t % lag); new t = t div
    lag; shifts restricted to multiples of ``stride``; length-1 sub-
    trajectories are dropped (reference :133). No Python, one window pass
    for the length filter.
    """
    if lag < 1:
        raise ValueError("lag must be >= 1")
    shift = F.col(time_col) % lag
    out = (
        df.where(shift % stride == 0)
        .withColumn("_sub", F.col(traj_col) * lag + shift)
        .withColumn("_subt", (F.col(time_col) - shift) / lag)
    )
    counts = out.groupBy("_sub").agg(F.count(F.lit(1)).alias("_len"))
    out = out.join(F.broadcast(counts.where(F.col("_len") > 1)), "_sub", "inner")
    return (
        out.drop(traj_col, time_col, "_len")
        .withColumnRenamed("_sub", traj_col)
        .withColumn(time_col, F.col("_subt").cast("long"))
        .drop("_subt")
    )


class MaximumLikelihoodHMM(Estimator):
    """ctor mirrors the reference (:78-99): initial_model, lagtime, stride,
    reversible, stationary, fixed p, accuracy, maxit."""

    def __init__(
        self,
        initial_model: HiddenMarkovModel,
        lagtime: int,
        stride: Union[int, str] = 1,
        reversible: bool = True,
        stationary: bool = False,
        p: Optional[np.ndarray] = None,
        accuracy: float = 1e-3,
        maxit: int = 100,
        maxit_reversible: int = 100_000,
        obs_col: str = "state",
        per_traj_stats: bool = False,
        assume_colocated: bool = False,
    ):
        super().__init__()
        if lagtime <= 0:
            raise ValueError("lagtime must be positive")
        self.initial_model = initial_model
        self.lagtime = lagtime
        self.stride = 1 if stride == "effective" else int(stride)
        self.reversible = reversible
        self.stationary = stationary
        self.fixed_stationary_distribution = p if stationary else None
        self.fixed_initial_distribution = p if not stationary else None
        self.accuracy = accuracy
        self.maxit = maxit
        self.maxit_reversible = maxit_reversible
        self.obs_col = obs_col
        # per_traj_stats: emit one sufficient-statistics row PER TRAJECTORY
        # (instead of per partition) and reduce them in sorted traj order —
        # the result is then independent of the partition layout and
        # replayable bit-exactly by an external oracle. Default stays
        # partition-batched (fewer rows, vectorized batch recursion).
        self.per_traj_stats = per_traj_stats
        # assume_colocated: caller guarantees the input frame is already
        # hash-partitioned (and ideally persisted) by traj_id. At lagtime=1 /
        # stride=1 the lagged frame IS the input frame minus length-1
        # trajectories, so fit() skips lag_observations_df's count-filter
        # join, the repartition, and the duplicate persist entirely and reads
        # the caller's cached partitions; singleton trajectories are dropped
        # inside the E-step instead (identical statistics — a length-1
        # trajectory contributes nothing once dropped, reference
        # markov/_util.py:133 drops them up front).
        self.assume_colocated = assume_colocated
        self.likelihoods_: Optional[np.ndarray] = None

    # ------------------------------------------------------------ E-step

    def _estep(self, df: DataFrame, A: np.ndarray, pi: np.ndarray, om) -> dict:
        """One distributed E-step: partition-batched forward-backward
        (mapInPandas over trajectory-partitioned input — one vectorized
        recursion per partition, one sufficient-statistics row out),
        driver-side reduction of the ~n_partitions stat rows."""
        from deeptime_spark.hmm.hmm_model import _partition_groups, forward_backward_batch

        N = len(pi)
        obs_col = self.obs_col
        per_traj = self.per_traj_stats
        schema = StructType(
            [
                StructField("traj_id", LongType()),
                StructField("loglik", DoubleType()),
                StructField("gamma0", ArrayType(DoubleType())),
                StructField("counts", ArrayType(DoubleType())),
                StructField("om_stats", ArrayType(DoubleType())),
            ]
        )

        def estep(batches):
            groups = _partition_groups(batches, obs_col)
            if groups:
                # lag_observations_df drops length-1 sub-trajectories up
                # front; the assume_colocated fast path defers that drop to
                # here (same statistics either way)
                groups = [g for g in groups if len(g[2]) > 1]
            if not groups:
                return
            if per_traj:
                # one row per trajectory: single-lane recursion keeps each
                # trajectory's statistics separate for the sorted reduce
                for tid, _, obs in groups:
                    pobs = om.to_state_probability_trajectory(obs)
                    loglik, gamma0, counts, gammas = forward_backward_batch(A, [pobs], pi)
                    yield pd.DataFrame(
                        {
                            "traj_id": [int(tid)],
                            "loglik": [loglik],
                            "gamma0": [gamma0.tolist()],
                            "counts": [counts.ravel().tolist()],
                            "om_stats": [om.collect_stats(obs, gammas[0]).tolist()],
                        }
                    )
                return
            pobs_list = [om.to_state_probability_trajectory(o) for _, _, o in groups]
            loglik, gamma0, counts, gammas = forward_backward_batch(A, pobs_list, pi)
            om_stats = np.zeros(om.stats_dim())
            for (_, _, obs), gamma in zip(groups, gammas):
                om_stats += om.collect_stats(obs, gamma)
            yield pd.DataFrame(
                {
                    "traj_id": [-1],
                    "loglik": [loglik],
                    "gamma0": [gamma0.tolist()],
                    "counts": [counts.ravel().tolist()],
                    "om_stats": [om_stats.tolist()],
                }
            )

        # one stats row per PARTITION (or per trajectory in per_traj
        # mode), so the driver reduction is O(partitions x N^2) floats —
        # negligible up to thousands of partitions. If a deployment ever
        # runs with 10^5+ partitions, insert a tree level (repartition the
        # stats rows to sqrt(P) and re-run a summing mapInPandas) before
        # this collect; the per_traj sorted-reduce replayability is
        # unaffected because that mode already fixes the reduction order.
        rows = df.mapInPandas(estep, schema=schema).collect()
        if not rows:
            raise ValueError("no (sub-)trajectories of length > 1 — lagtime too large?")
        if per_traj:
            rows = sorted(rows, key=lambda r: r["traj_id"])
        agg = {
            "loglik": 0.0,
            "gamma0": np.zeros(N),
            "counts": np.zeros((N, N)),
            "om_stats": np.zeros(om.stats_dim()),
        }
        for r in rows:
            agg["loglik"] += r["loglik"]
            agg["gamma0"] += np.array(r["gamma0"])
            agg["counts"] += np.array(r["counts"]).reshape(N, N)
            agg["om_stats"] += np.array(r["om_stats"])
        return agg

    # ------------------------------------------------------------ M-step

    def _mstep(self, agg: dict, om) -> tuple[np.ndarray, np.ndarray]:
        C = agg["counts"]
        if self.reversible:
            if self.fixed_stationary_distribution is not None:
                T = transition_matrix_reversible_fixed_pi(
                    C, self.fixed_stationary_distribution, maxiter=self.maxit_reversible
                )
            else:
                T = transition_matrix_reversible(C, maxiter=self.maxit_reversible, maxerr=1e-12)
        else:
            T = transition_matrix_nonreversible(C)
        if self.stationary:
            if self.fixed_stationary_distribution is not None:
                pi = self.fixed_stationary_distribution
            else:
                from deeptime_spark.markov.analysis import stationary_distribution

                pi = stationary_distribution(T)
        else:
            if self.fixed_initial_distribution is not None:
                pi = self.fixed_initial_distribution
            else:
                pi = agg["gamma0"] / agg["gamma0"].sum()
        om.fit_from_stats(agg["om_stats"])
        return T, pi

    # -------------------------------------------------------------- fit

    def fit(self, df: DataFrame, progress=None) -> "MaximumLikelihoodHMM":
        from deeptime_spark.callbacks import ProgressCallback

        init = self.initial_model
        A = np.array(init.transition_matrix, dtype=np.float64, copy=True)
        pi = np.array(init.initial_distribution, dtype=np.float64, copy=True)
        om = init.output_model.copy()

        if self.lagtime == 1 and self.stride == 1 and self.assume_colocated:
            # input frame == lagged frame at lag 1; caller already co-located
            # (and usually persisted) it by traj_id — no second shuffle, no
            # duplicate cache; singleton trajectories drop inside the E-step
            lagged = df.select("traj_id", "t", self.obs_col)
            owns_cache = False
        else:
            lagged = lag_observations_df(df, self.lagtime, self.stride)
            # the EM loop re-reads the lagged frame every iteration: persist it
            # ALREADY co-located by trajectory, so each E-step's mapInPandas
            # reads cached partitions with zero per-iteration shuffle
            lagged = (
                lagged.select("traj_id", "t", self.obs_col)
                .repartition(
                    df.sparkSession.sparkContext.defaultParallelism, "traj_id"
                )
                .persist()
            )
            owns_cache = True
        try:
            likelihoods = []
            final_counts = None
            converged = False
            with ProgressCallback(progress, desc="baum-welch", total=self.maxit) as cb:
                for it in range(self.maxit):
                    agg = self._estep(lagged, A, pi, om)
                    loglik = agg["loglik"]
                    if likelihoods and (loglik - likelihoods[-1]) < self.accuracy:
                        converged = True
                    likelihoods.append(loglik)
                    A, pi = self._mstep(agg, om)
                    final_counts = agg["counts"]
                    cb()
                    if converged:
                        break
        finally:
            if owns_cache:
                lagged.unpersist()

        self.likelihoods_ = np.array(likelihoods)
        count_model = TransitionCountModel(final_counts, lagtime=self.lagtime)
        transition_model = MarkovStateModel(
            A, reversible=self.reversible, lagtime=self.lagtime, count_model=count_model
        )
        self._model = HiddenMarkovModel(
            transition_model=transition_model,
            output_model=om,
            initial_distribution=pi,
            likelihoods=self.likelihoods_,
            initial_count=agg["gamma0"],
            stride=self.stride,
        )
        return self
