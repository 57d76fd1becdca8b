"""Sampling frames by discrete state — fully distributed.

Reference: ``compute_state_indices`` / ``markov.sample.{indices_by_state,
by_state, indices_by_distribution}``
(/root/reference/src/deeptime/markov/sample/__init__.py:8-177,
markov/_markov_state_model.py:1164).

Spark shape (SURVEY.md §2.8): index lists are a
``groupBy(state).agg(collect_list(struct(traj_id, t)))``; uniform
per-state frame draws are a seeded window ``row_number`` over a random
order — one shuffle each, no driver-side loops over frames.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from deeptime_spark.local_relation import local_df as _local_df
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compute_state_indices_df(df: DataFrame, state_col: str = "state") -> DataFrame:
    """(state, indices: array<struct<traj_id, t>>, n_frames) — the
    distributed form of the reference's per-state (traj, t) index lists."""
    return (
        df.where(F.col(state_col) >= 0)
        .groupBy(state_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("traj_id", "t"))).alias("indices"),
            F.count(F.lit(1)).alias("n_frames"),
        )
    )


def sample_by_state_df(
    df: DataFrame, n_samples: int, seed: int = 42, state_col: str = "state", replace: bool = False
) -> DataFrame:
    """Draw up to ``n_samples`` uniform frames per state (reference
    sample.by_state / indices_by_state): seeded random order within each
    state partition, keep the first n. Without replacement (reference
    draws WITH replacement by default — for distributed feeds the
    without-replacement variant is the useful one; ``replace`` re-samples
    rows proportionally via posexplode of a multiplicity column)."""
    w = Window.partitionBy(state_col).orderBy(F.rand(seed), F.col("traj_id"), F.col("t"))
    picked = (
        df.where(F.col(state_col) >= 0)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_samples)
        .drop("_rn")
    )
    if not replace:
        return picked
    # with replacement: each kept frame appears Multinomial-ish times —
    # approximate by re-exploding up to ceil(n_samples / count) copies
    counts = picked.groupBy(state_col).agg(F.count(F.lit(1)).alias("_n"))
    joined = picked.join(F.broadcast(counts), state_col)
    mult = F.ceil(F.lit(n_samples) / F.col("_n")).cast("int")
    exploded = joined.withColumn("_copy", F.explode(F.sequence(F.lit(1), mult))).drop("_n")
    w2 = Window.partitionBy(state_col).orderBy(F.rand(seed + 1), F.col("traj_id"), F.col("t"), F.col("_copy"))
    return (
        exploded.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= n_samples)
        .drop("_rn", "_copy")
    )


def indices_by_distribution_df(
    df: DataFrame,
    distributions: np.ndarray,
    n_samples: int,
    seed: int = 42,
    state_col: str = "state",
) -> DataFrame:
    """Draw frames according to probability distributions over states
    (reference sample/__init__.py:124-176): for each distribution row,
    states are sampled by weight and frames uniformly within the state.
    Realized as a weighted per-distribution priority draw: weight w ->
    priority rand()^(1/w) (Efraimidis-Spirakis A-Res), top-n per
    distribution — one shuffle keyed by distribution id."""
    distributions = np.atleast_2d(np.asarray(distributions, dtype=np.float64))
    spark = df.sparkSession
    rows = [
        (int(d), int(s), float(p))
        for d, dist in enumerate(distributions)
        for s, p in enumerate(dist)
        if p > 0.0
    ]
    lut = _local_df(spark, rows, ["dist_id", "_state", "weight"])
    joined = df.where(F.col(state_col) >= 0).join(
        F.broadcast(lut), df[state_col] == lut["_state"]
    ).drop("_state")
    priority = F.pow(F.rand(seed), 1.0 / F.col("weight"))
    w = Window.partitionBy("dist_id").orderBy(F.desc(priority), F.col("traj_id"), F.col("t"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_samples)
        .drop("_rn", "weight")
    )
