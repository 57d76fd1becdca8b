"""SVG plot renderers (plots.py): well-formed XML, expected element
counts, and the geometric/semantic invariants the reference's matplotlib
plots encode (node sizing by pi, committor-ordered flux layout, CK grid
shape, exclusion region)."""

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from deeptime_spark.plots import (
    Network,
    plot_ck_test,
    plot_energy2d,
    plot_flux,
    plot_implied_timescales,
    plot_markov_model,
)

NS = "{http://www.w3.org/2000/svg}"


def _parse(svg: str):
    return ET.fromstring(svg)


def _count(root, tag, cls=None):
    return len([
        e for e in root.iter(NS + tag)
        if cls is None or e.attrib.get("class") == cls
    ])


def test_network_renders_nodes_edges_and_self_loops():
    A = np.array([[0.5, 0.5, 0.0], [0.1, 0.9, 0.0], [0.0, 0.2, 0.8]])
    svg = Network(A).render()
    root = _parse(svg)
    assert _count(root, "circle", "node") == 3
    # off-diagonal nonzero entries are curved edges, diagonals self-loops
    assert _count(root, "path", "edge") == 3
    assert _count(root, "circle", "selfloop") == 3
    # deterministic output
    assert svg == Network(A).render()


def test_network_rejects_bad_shapes():
    with pytest.raises(ValueError, match="square"):
        Network(np.zeros((2, 3)))
    with pytest.raises(ValueError, match="positions"):
        Network(np.eye(2), positions=np.zeros((3, 2)))


def test_plot_markov_model_thresholds_edges_and_sizes_by_pi():
    P = np.array([[0.97, 0.03], [0.5, 0.5]])
    svg = plot_markov_model(P, threshold=0.1)
    root = _parse(svg)
    # 0->1 (0.03) is below threshold: only 1->0 drawn among off-diagonals
    assert _count(root, "path", "edge") == 1
    assert _count(root, "circle", "selfloop") == 2
    # edge label text carries the probability
    assert any("0.50" in (e.text or "") for e in root.iter(NS + "text"))


def test_plot_flux_orders_by_committor(spark):
    from deeptime_spark.markov.tpt import reactive_flux

    P = np.array(
        [
            [0.8, 0.15, 0.05, 0.0],
            [0.1, 0.75, 0.1, 0.05],
            [0.05, 0.1, 0.8, 0.05],
            [0.0, 0.02, 0.02, 0.96],
        ]
    )
    flux = reactive_flux(P, [0], [3])
    svg = plot_flux(flux)
    root = _parse(svg)
    nodes = [e for e in root.iter(NS + "circle") if e.attrib.get("class") == "node"]
    assert len(nodes) == 4
    xs = [float(e.attrib["cx"]) for e in nodes]
    q = np.asarray(flux.forward_committor)
    # x positions are monotone in the forward committor
    assert all(
        (q[i] - q[j]) * (xs[i] - xs[j]) >= 0 for i in range(4) for j in range(4)
    )


def test_plot_implied_timescales_curves_and_exclusion(spark):
    from deeptime_spark.validation import implied_timescales_from_dtrajs

    rows = []
    rng = np.random.default_rng(0)
    s = 0
    for t in range(600):
        s = s if rng.random() < 0.9 else 1 - s
        rows.append((0, t, s))
    df = spark.createDataFrame(rows, "traj_id long, t long, state long")
    its = implied_timescales_from_dtrajs(df, lagtimes=[1, 2, 3], n_its=1)
    svg = plot_implied_timescales(its)
    root = _parse(svg)
    assert _count(root, "polygon", "exclusion") == 1
    assert _count(root, "polyline", "its") >= 1


def test_plot_ck_test_grid(spark):
    from deeptime_spark.validation import ck_test, fit_msms_at_lags

    rows = []
    rng = np.random.default_rng(1)
    s = 0
    for t in range(800):
        s = s if rng.random() < 0.85 else 1 - s
        rows.append((0, t, s))
    df = spark.createDataFrame(rows, "traj_id long, t long, state long")
    ck = ck_test(fit_msms_at_lags(df, lagtimes=[1, 2]), n_metastable_sets=2)
    svg = plot_ck_test(ck)
    root = _parse(svg)
    # 2x2 grid: one predicted + one estimated polyline per panel
    assert _count(root, "polyline", "predicted") == 4
    assert _count(root, "polyline", "estimated") == 4


def test_plot_energy2d_cells_and_nan_blanks():
    E = np.array([[0.0, 1.0, np.inf], [2.0, np.nan, 0.5]])
    svg = plot_energy2d(E)
    root = _parse(svg)
    # 6 bins, 2 non-finite -> 4 colored cells; colorbar present
    assert _count(root, "rect", "cell") == 4
    assert _count(root, "rect", "cbar") > 0
