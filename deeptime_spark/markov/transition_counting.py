"""Transition counting — the engine's groupBy-count layer.

Reference: ``TransitionCountEstimator``
(/root/reference/src/deeptime/markov/_transition_counting.py:423-636) with
count modes sliding / sliding-effective / sample (:428-447; the doctest at
:617-623 pins the sliding semantics), ``TransitionCountModel`` (:42-421),
``count_states`` (markov/_util.py:25).

Spark realization: ``lead(state, tau)`` over the per-trajectory window, then
``groupBy(s_from, s_to).count()``. At scale this is one shuffle whose key
cardinality is n_states^2 — tiny — so the reduce side is trivially
broadcast-collectable; AQE handles the skew that hot states produce on the
map side. The collected COO becomes a driver-side dense/sparse matrix at the
natural distributed/local IR boundary (SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deeptime_spark.base import Estimator, Model


def count_states(df: DataFrame, state_col: str = "state", ignore_negative: bool = True) -> np.ndarray:
    """Histogram of state visits (reference markov/_util.py:25-55).

    Returns a dense vector indexed by state; -1 (unassigned) is excluded
    when ignore_negative.
    """
    grouped = df.groupBy(state_col).count().collect()
    pairs = [(r[state_col], r["count"]) for r in grouped if r[state_col] is not None]
    if ignore_negative:
        pairs = [(s, c) for s, c in pairs if s >= 0]
    n = max(s for s, _ in pairs) + 1 if pairs else 0
    out = np.zeros(n, dtype=np.int64)
    for s, c in pairs:
        out[s] = c
    return out


class TransitionCountModel(Model):
    """Count-matrix container (reference: _transition_counting.py:42-421).

    Holds the (n, n) dense count matrix (no scipy in this environment;
    n_states is small relative to data volume by construction — for huge
    state spaces the counts stay distributed as a DataFrame upstream), the
    state histogram and the symbol<->index mapping for submodels.
    """

    def __init__(
        self,
        count_matrix,
        counting_mode: Optional[str] = None,
        lagtime: int = 1,
        state_histogram: Optional[np.ndarray] = None,
        state_symbols: Optional[np.ndarray] = None,
    ):
        self.count_matrix = count_matrix
        self.counting_mode = counting_mode
        self.lagtime = lagtime
        self.state_histogram = state_histogram
        self.state_symbols = (
            state_symbols if state_symbols is not None else np.arange(self._n(count_matrix))
        )

    @staticmethod
    def _n(C) -> int:
        return C.shape[0]

    @property
    def n_states(self) -> int:
        return self._n(self.count_matrix)

    @property
    def total_count(self) -> float:
        C = self.count_matrix
        return float(C.sum())

    def connected_sets(self, directed: bool = True) -> list[np.ndarray]:
        """Connected components of the count graph, largest first
        (reference api.py:410-461; driver-side — n_states is small relative
        to data volume by construction)."""
        from deeptime_spark.numeric.graph import connected_components

        return connected_components(self.count_matrix > 0, directed=directed)

    def submodel(self, states: np.ndarray) -> "TransitionCountModel":
        """Restriction to a state subset (reference :333-363)."""
        states = np.asarray(states)
        sub = self.count_matrix[np.ix_(states, states)]
        hist = self.state_histogram[states] if self.state_histogram is not None else None
        return TransitionCountModel(
            sub,
            counting_mode=self.counting_mode,
            lagtime=self.lagtime,
            state_histogram=hist,
            state_symbols=self.state_symbols[states],
        )

    def submodel_largest(self, directed: bool = True) -> "TransitionCountModel":
        """Largest connected submodel (reference :364-405)."""
        return self.submodel(self.connected_sets(directed=directed)[0])

    def states_to_symbols(self, states: np.ndarray) -> np.ndarray:
        return self.state_symbols[np.asarray(states)]

    def symbols_to_states(self, symbols) -> np.ndarray:
        lookup = {s: i for i, s in enumerate(self.state_symbols)}
        return np.array([lookup[s] for s in symbols if s in lookup], dtype=int)


def transition_counts_df(
    df: DataFrame,
    lagtime: int,
    count_mode: str = "sliding",
    state_col: str = "state",
    traj_col: str = "traj_id",
    time_col: str = "t",
) -> DataFrame:
    """Distributed transition-count DataFrame ``(s_from, s_to, n)``.

    The Spark-side stage of TransitionCountEstimator.fit (which collects
    this and builds the dense driver matrix): ``lead(state, tau)`` per
    trajectory then ``groupBy(s_from, s_to)`` — one shuffle, n_states^2
    keys. Exposed separately so huge state spaces can keep counts
    distributed and so the harness can verify the counting query itself.
    """
    tau = lagtime
    w = Window.partitionBy(traj_col).orderBy(time_col)
    pairs = df.withColumn("s_to", F.lead(state_col, tau).over(w)).where(F.col("s_to").isNotNull())
    if count_mode == "sample":
        pairs = pairs.where(F.col(time_col) % tau == 0)
    pairs = pairs.where((F.col(state_col) >= 0) & (F.col("s_to") >= 0))
    counted = pairs.groupBy(F.col(state_col).alias("s_from"), F.col("s_to")).agg(
        F.count(F.lit(1)).alias("n")
    )
    if count_mode == "sliding-effective":
        counted = counted.withColumn("n", F.col("n") / tau)
    return counted


def two_step_counts_df(
    df: DataFrame,
    lagtime: int,
    state_col: str = "state",
    traj_col: str = "traj_id",
    time_col: str = "t",
) -> DataFrame:
    """Two-step count tensor C2t[s0, s1, s2] at lag tau — the OOM/spectral
    estimation input (reference markov/msm/_koopman_reweighted_msm_impl.py;
    SURVEY §2.7 row 70): double-lead window then ONE groupBy over
    (s0, s1, s2) — n_states^3 keys, still tiny at the MSM layer."""
    tau = lagtime
    w = Window.partitionBy(traj_col).orderBy(time_col)
    pairs = (
        df.withColumn("s1", F.lead(state_col, tau).over(w))
        .withColumn("s2", F.lead(state_col, 2 * tau).over(w))
        .where(F.col("s1").isNotNull() & F.col("s2").isNotNull())
        .where((F.col(state_col) >= 0) & (F.col("s1") >= 0) & (F.col("s2") >= 0))
    )
    return pairs.groupBy(F.col(state_col).alias("s0"), "s1", "s2").agg(
        F.count(F.lit(1)).alias("n")
    )


class TransitionCountEstimator(Estimator):
    """ctor mirrors the reference (:423-460): lagtime, count_mode in
    {'sliding', 'sliding-effective', 'sample'}, n_states override, sparse.

    ``fit(df)`` expects the dtraj schema (traj_id, t, state). Negative
    states (unassigned, reference :148) are excluded from counting.
    """

    SPARSE_OCCUPANCY_THRESHOLD = 1.0 / 3.0

    def __init__(
        self,
        lagtime: int,
        count_mode: str = "sliding",
        n_states: Optional[int] = None,
        sparse: Optional[bool] = None,
        state_col: str = "state",
    ):
        super().__init__()
        if count_mode not in ("sliding", "sliding-effective", "sample", "effective"):
            raise ValueError(f"unsupported count_mode {count_mode!r}")
        self.lagtime = lagtime
        self.count_mode = count_mode
        self.n_states = n_states
        self.sparse = sparse
        self.state_col = state_col

    def fit(self, df: DataFrame) -> "TransitionCountEstimator":
        tau = self.lagtime
        sc = self.state_col
        if self.count_mode == "effective":
            # statistically uncorrelated counts (reference api.py:154):
            # indicator-series inefficiencies scale the sliding counts
            from deeptime_spark.markov.effective_counts import effective_count_matrix

            C = effective_count_matrix(df, tau, n_states=self.n_states, state_col=sc)
            hist = count_states(df, state_col=sc)
            if len(hist) < C.shape[0]:
                hist = np.pad(hist, (0, C.shape[0] - len(hist)))
            self._model = TransitionCountModel(
                C, counting_mode="effective", lagtime=tau, state_histogram=hist
            )
            return self
        # ONE Spark job for transitions AND the state histogram: frames
        # whose lagged partner is invalid (trajectory tail, negative
        # state, off-stride in 'sample' mode) aggregate under s_to=NULL —
        # they contribute to the histogram only. Saves the second full
        # scan the reference pays via a separate count_states pass.
        w = Window.partitionBy("traj_id").orderBy("t")
        valid = F.col("_lead").isNotNull() & (F.col("_lead") >= 0)
        if self.count_mode == "sample":
            valid = valid & (F.col("t") % tau == 0)
        fused = (
            df.withColumn("_lead", F.lead(sc, tau).over(w))  # lead BEFORE the
            .where(F.col(sc) >= 0)  # negative-state filter: -1 frames still occupy time slots
            .withColumn("_s_to", F.when(valid, F.col("_lead")))
            .groupBy(F.col(sc).alias("s_from"), F.col("_s_to").alias("s_to"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        scale = 1.0 / tau if self.count_mode == "sliding-effective" else 1.0
        counted = [r for r in fused if r["s_to"] is not None]
        hist_n = max((r["s_from"] for r in fused), default=-1) + 1
        hist = np.zeros(hist_n, dtype=np.int64)
        for r in fused:
            hist[r["s_from"]] += r["n"]
        n = self.n_states or max(
            len(hist), (max((max(r["s_from"], r["s_to"]) for r in counted), default=-1) + 1)
        )
        rows = np.array([r["s_from"] for r in counted], dtype=int)
        cols = np.array([r["s_to"] for r in counted], dtype=int)
        vals = np.array([r["n"] for r in counted], dtype=np.float64) * scale
        C = np.zeros((n, n), dtype=np.float64)
        np.add.at(C, (rows, cols), vals)
        if len(hist) < n:
            hist = np.pad(hist, (0, n - len(hist)))
        self._model = TransitionCountModel(
            C,
            counting_mode=self.count_mode,
            lagtime=tau,
            state_histogram=hist,
        )
        return self
