"""Graph exports for MSM / TPT results — the data half of the
reference's plots/network layer (reference plots/network.py:14-542
renders a ``Network`` from an adjacency matrix; everything a notebook
needs from that object short of the matplotlib drawing is the weighted
edge list and per-node attributes, which is what these helpers emit).

Two faces per object:

- ``*_edges`` / ``*_nodes`` -> Spark DataFrames, so downstream pipelines
  (joins against state metadata, sinks, GraphFrames-style tooling) stay
  distributed and declarative;
- ``to_networkx`` -> a ``networkx.DiGraph`` for driver-side layout /
  drawing, gated behind an import-try since networkx is an optional
  dependency.

The matrices involved are driver-side (n_states x n_states) numpy —
SURVEY.md maps the whole MSM-analysis layer to driver math — so the
DataFrames are built with ``createDataFrame`` on the already-small edge
list, never by distributing the dense matrix.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

import numpy as np

from deeptime_spark.local_relation import local_df as _local_df

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


def matrix_edges(
    spark: "SparkSession",
    matrix: np.ndarray,
    threshold: float = 0.0,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> "DataFrame":
    """Weighted edge DataFrame from a dense (n, n) matrix: one row per
    entry with ``abs(weight) > threshold`` (strictly above, so the
    default 0.0 drops structural zeros), columns
    ``(src long, dst long, weight double)``."""
    m = np.asarray(matrix, dtype=np.float64)
    if m.ndim != 2 or m.shape[0] != m.shape[1]:
        raise ValueError(f"expected a square matrix, got shape {m.shape}")
    src, dst = np.nonzero(np.abs(m) > threshold)
    rows = [
        (int(i), int(j), float(m[i, j])) for i, j in zip(src.tolist(), dst.tolist())
    ]
    return _local_df(spark, 
        rows, f"{src_col} long, {dst_col} long, {weight_col} double"
    )


def msm_edges(
    spark: "SparkSession", msm, threshold: float = 0.0
) -> "DataFrame":
    """Transition-probability edges of a ``MarkovStateModel``:
    ``(src, dst, prob)`` for every transition with prob > threshold."""
    return matrix_edges(
        spark, msm.transition_matrix, threshold=threshold, weight_col="prob"
    )


def msm_nodes(spark: "SparkSession", msm) -> "DataFrame":
    """Per-state node attributes of a ``MarkovStateModel``:
    ``(state, pi)`` with the stationary distribution as node weight
    (the reference Network's default ``state_sizes``)."""
    pi = np.asarray(msm.stationary_distribution, dtype=np.float64)
    return _local_df(spark, 
        [(int(i), float(p)) for i, p in enumerate(pi.tolist())],
        "state long, pi double",
    )


def flux_edges(
    spark: "SparkSession",
    flux,
    kind: str = "net",
    fraction: Optional[float] = None,
    threshold: float = 0.0,
) -> "DataFrame":
    """Edge DataFrame of a ``ReactiveFlux``: ``kind`` selects
    ``net_flux`` (default) or ``gross_flux``; ``fraction`` (net only)
    restricts to the ``major_flux`` subnetwork carrying that share of
    the total A->B flux. Columns ``(src, dst, flux)``."""
    if kind not in ("net", "gross"):
        raise ValueError(f"kind must be 'net' or 'gross', got {kind!r}")
    if fraction is not None:
        if kind != "net":
            raise ValueError("fraction subsetting is defined on the net flux")
        m = flux.major_flux(fraction=fraction)
    else:
        m = flux.net_flux if kind == "net" else flux.gross_flux
    return matrix_edges(spark, m, threshold=threshold, weight_col="flux")


def flux_nodes(spark: "SparkSession", flux) -> "DataFrame":
    """Per-state node attributes of a ``ReactiveFlux``:
    ``(state, pi, committor_forward, committor_backward, role)`` where
    role is 'source' / 'target' / 'intermediate' — everything the
    reference's flux network plot annotates nodes with."""
    pi = np.asarray(flux.stationary_distribution, dtype=np.float64)
    qf = np.asarray(flux.forward_committor, dtype=np.float64)
    qb = np.asarray(flux.backward_committor, dtype=np.float64)
    src = {int(s) for s in np.asarray(flux.source_states).ravel().tolist()}
    tgt = {int(s) for s in np.asarray(flux.target_states).ravel().tolist()}
    rows = []
    for i in range(len(pi)):
        role = "source" if i in src else ("target" if i in tgt else "intermediate")
        rows.append((i, float(pi[i]), float(qf[i]), float(qb[i]), role))
    return _local_df(spark, 
        rows,
        "state long, pi double, committor_forward double, "
        "committor_backward double, role string",
    )


def to_networkx(obj, threshold: float = 0.0, kind: str = "net"):
    """Driver-side ``networkx.DiGraph`` from a ``MarkovStateModel``, a
    ``ReactiveFlux``, or a bare (n, n) matrix — the hand-off point for
    notebook layout/drawing (the reference draws via its own
    ``Network``/Fruchterman-Reingold; any nx layout works here).

    Edge attribute is ``weight``; MSM nodes carry ``pi``, flux nodes
    carry ``pi`` / committors / ``role`` as attributes."""
    try:
        import networkx as nx
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "to_networkx requires the optional networkx package; "
            "the DataFrame exports (msm_edges/flux_edges/...) work without it"
        ) from exc

    from deeptime_spark.markov.msm import MarkovStateModel
    from deeptime_spark.markov.tpt import ReactiveFlux

    g = nx.DiGraph()
    if isinstance(obj, MarkovStateModel):
        m = obj.transition_matrix
        pi = np.asarray(obj.stationary_distribution)
        for i in range(obj.n_states):
            g.add_node(i, pi=float(pi[i]))
    elif isinstance(obj, ReactiveFlux):
        m = obj.net_flux if kind == "net" else obj.gross_flux
        pi = np.asarray(obj.stationary_distribution)
        qf = np.asarray(obj.forward_committor)
        qb = np.asarray(obj.backward_committor)
        src = {int(s) for s in np.asarray(obj.source_states).ravel().tolist()}
        tgt = {int(s) for s in np.asarray(obj.target_states).ravel().tolist()}
        for i in range(len(pi)):
            role = (
                "source" if i in src else ("target" if i in tgt else "intermediate")
            )
            g.add_node(
                i,
                pi=float(pi[i]),
                committor_forward=float(qf[i]),
                committor_backward=float(qb[i]),
                role=role,
            )
    else:
        m = np.asarray(obj, dtype=np.float64)
        if m.ndim != 2 or m.shape[0] != m.shape[1]:
            raise ValueError(f"expected a square matrix, got shape {m.shape}")
        g.add_nodes_from(range(m.shape[0]))
    for i, j in zip(*np.nonzero(np.abs(m) > threshold)):
        g.add_edge(int(i), int(j), weight=float(m[i, j]))
    return g
