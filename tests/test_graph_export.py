"""MSM/TPT graph exports (markov/graph_export.py) — the data half of the
reference's plots/network layer (reference plots/network.py:14-542)."""

import numpy as np
import pytest

from deeptime_spark.markov.graph_export import (
    flux_edges,
    flux_nodes,
    matrix_edges,
    msm_edges,
    msm_nodes,
    to_networkx,
)
from deeptime_spark.markov.msm import MarkovStateModel
from deeptime_spark.markov.tpt import reactive_flux


P = np.array(
    [
        [0.8, 0.15, 0.05, 0.0],
        [0.1, 0.75, 0.05, 0.1],
        [0.05, 0.1, 0.8, 0.05],
        [0.0, 0.2, 0.05, 0.75],
    ]
)


def test_matrix_edges_threshold_and_shape(spark):
    df = matrix_edges(spark, P, threshold=0.0)
    rows = {(r["src"], r["dst"]): r["weight"] for r in df.collect()}
    assert len(rows) == int((P > 0).sum())
    assert rows[(0, 1)] == pytest.approx(0.15)
    assert (0, 3) not in rows  # structural zero dropped
    few = matrix_edges(spark, P, threshold=0.5).collect()
    assert {(r["src"], r["dst"]) for r in few} == {(i, i) for i in range(4)}
    with pytest.raises(ValueError):
        matrix_edges(spark, np.ones((2, 3)))


def test_msm_edges_nodes_round_trip(spark):
    msm = MarkovStateModel(P)
    edges = msm_edges(spark, msm).collect()
    back = np.zeros_like(P)
    for r in edges:
        back[r["src"], r["dst"]] = r["prob"]
    np.testing.assert_allclose(back, P)
    nodes = {r["state"]: r["pi"] for r in msm_nodes(spark, msm).collect()}
    np.testing.assert_allclose(
        [nodes[i] for i in range(4)], msm.stationary_distribution
    )


def test_flux_edges_nodes_and_major_subnetwork(spark):
    msm = MarkovStateModel(P)
    flux = msm.reactive_flux([0], [3])
    net = flux_edges(spark, flux).collect()
    back = np.zeros_like(P)
    for r in net:
        back[r["src"], r["dst"]] = r["flux"]
    np.testing.assert_allclose(back, flux.net_flux)
    # major subnetwork carries >= fraction of the total flux, never more
    # edges than the full net
    major = flux_edges(spark, flux, fraction=0.9).collect()
    assert len(major) <= len(net)
    assert sum(r["flux"] for r in major) >= 0.9 * flux.total_flux - 1e-12
    roles = {r["state"]: r["role"] for r in flux_nodes(spark, flux).collect()}
    assert roles[0] == "source" and roles[3] == "target"
    assert roles[1] == roles[2] == "intermediate"
    with pytest.raises(ValueError):
        flux_edges(spark, flux, kind="gross", fraction=0.5)
    with pytest.raises(ValueError):
        flux_edges(spark, flux, kind="bogus")


def test_to_networkx_msm_flux_matrix():
    nx = pytest.importorskip("networkx")
    msm = MarkovStateModel(P)
    g = to_networkx(msm)
    assert g.number_of_nodes() == 4
    assert g[0][1]["weight"] == pytest.approx(0.15)
    assert g.nodes[0]["pi"] == pytest.approx(msm.stationary_distribution[0])

    flux = msm.reactive_flux([0], [3])
    gf = to_networkx(flux)
    assert gf.nodes[0]["role"] == "source"
    # net flux is acyclic source->target: no edge back into the source
    assert all(v != 0 for _, v in gf.edges())

    gm = to_networkx(P, threshold=0.5)
    assert set(gm.edges()) == {(i, i) for i in range(4)}
    with pytest.raises(ValueError):
        to_networkx(np.ones((2, 3)))
