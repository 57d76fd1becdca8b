"""Plot rendering without matplotlib: deterministic SVG emitters.

Reference: the ``deeptime.plots`` package (plots/network.py:14-542
``Network``/``plot_markov_model``/``plot_flux``,
plots/implied_timescales.py:12 ``plot_implied_timescales``,
plots/chapman_kolmogorov.py:97 ``plot_ck_test``, plots/energy.py:42
``plot_energy2d``) draws on matplotlib axes. This container's runtime
contract has no matplotlib, and an engine's job is the *data*; the
rendering half was therefore a documented partial (SURVEY §2.13) with
markov/graph_export.py covering the data structures. This module closes
the gap with self-contained SVG renderers: every function returns an
SVG document as a ``str`` — embeddable in notebooks/HTML, diffable,
byte-deterministic (pure float formatting, no RNG, no font metrics) —
over the same model objects the reference's plot functions take.

Deliberate deviations (documented):
- default node layout is the deterministic circular layout instead of
  the reference's networkx spring layout (which is seeded-stochastic);
  explicit ``pos`` overrides, and ``plot_flux`` orders states by
  committor exactly like the reference;
- colors use a small built-in viridis-like ramp instead of matplotlib
  colormaps.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "Network",
    "plot_markov_model",
    "plot_flux",
    "plot_implied_timescales",
    "plot_ck_test",
    "plot_energy2d",
]


def _fmt(x: float) -> str:
    """Stable short float formatting for SVG attributes."""
    return f"{float(x):.3f}".rstrip("0").rstrip(".")


def _viridis(t: float) -> str:
    """Tiny 5-anchor viridis-like ramp, linearly interpolated."""
    anchors = [
        (0.0, (68, 1, 84)),
        (0.25, (59, 82, 139)),
        (0.5, (33, 145, 140)),
        (0.75, (94, 201, 98)),
        (1.0, (253, 231, 37)),
    ]
    t = min(1.0, max(0.0, float(t)))
    for (t0, c0), (t1, c1) in zip(anchors[:-1], anchors[1:]):
        if t <= t1:
            f = 0.0 if t1 == t0 else (t - t0) / (t1 - t0)
            r, g, b = (round(a + f * (b_ - a)) for a, b_ in zip(c0, c1))
            return f"rgb({r},{g},{b})"
    return "rgb(253,231,37)"


def _svg(width: float, height: float, body: list) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_fmt(width)}" '
        f'height="{_fmt(height)}" viewBox="0 0 {_fmt(width)} {_fmt(height)}">\n'
        + "\n".join(body)
        + "\n</svg>"
    )


class Network:
    """Weighted directed graph rendering (reference plots/network.py:14:
    curved edges with width proportional to weight, node discs sized by
    ``state_sizes``, self-loops, optional edge labels).

    ``positions`` are unit-square coordinates; default is the circular
    layout (deterministic). ``render()`` returns the SVG string."""

    def __init__(self, adjacency: np.ndarray,
                 positions: Optional[np.ndarray] = None,
                 state_sizes: Optional[Sequence[float]] = None,
                 state_labels: Optional[Sequence[str]] = None,
                 edge_labels: Optional[np.ndarray] = None,
                 state_colors: Optional[Sequence[float]] = None):
        A = np.asarray(adjacency, dtype=np.float64)
        if A.ndim != 2 or A.shape[0] != A.shape[1]:
            raise ValueError(f"adjacency must be square, got {A.shape}")
        self.adjacency = A
        n = A.shape[0]
        if positions is None:
            ang = 2.0 * np.pi * np.arange(n) / max(n, 1)
            positions = 0.5 + 0.4 * np.column_stack([np.cos(ang), np.sin(ang)])
        self.positions = np.asarray(positions, dtype=np.float64)
        if self.positions.shape != (n, 2):
            raise ValueError(f"positions must be ({n}, 2)")
        sizes = np.full(n, 1.0) if state_sizes is None else np.asarray(state_sizes, np.float64)
        smax = sizes.max() if len(sizes) and sizes.max() > 0 else 1.0
        self.state_sizes = sizes / smax
        self.state_labels = (
            [str(i) for i in range(n)] if state_labels is None else list(state_labels)
        )
        self.edge_labels = edge_labels
        self.state_colors = state_colors

    @property
    def n_nodes(self) -> int:
        return self.adjacency.shape[0]

    def render(self, size: float = 400.0, min_node_r: float = 8.0,
               max_node_r: float = 26.0, max_edge_w: float = 6.0) -> str:
        A = self.adjacency
        n = self.n_nodes
        P = self.positions * size
        wmax = np.abs(A).max() if n and np.abs(A).max() > 0 else 1.0
        radii = min_node_r + (max_node_r - min_node_r) * np.sqrt(self.state_sizes)
        body = [f'<rect width="{_fmt(size)}" height="{_fmt(size)}" fill="white"/>']
        # arrowhead marker
        body.append(
            '<defs><marker id="arr" viewBox="0 0 10 10" refX="9" refY="5" '
            'markerWidth="6" markerHeight="6" orient="auto-start-reverse">'
            '<path d="M 0 0 L 10 5 L 0 10 z" fill="#555"/></marker></defs>'
        )
        for i in range(n):
            for j in range(n):
                w = A[i, j]
                if w == 0.0:
                    continue
                sw = max(0.6, max_edge_w * abs(w) / wmax)
                if i == j:
                    cx, cy = P[i]
                    r = radii[i]
                    body.append(
                        f'<circle cx="{_fmt(cx + r)}" cy="{_fmt(cy - r)}" r="{_fmt(r * 0.7)}" '
                        f'fill="none" stroke="#555" stroke-width="{_fmt(sw)}" class="selfloop"/>'
                    )
                    continue
                x0, y0 = P[i]
                x1, y1 = P[j]
                dx, dy = x1 - x0, y1 - y0
                dist = math.hypot(dx, dy) or 1.0
                # trim ends to the node boundaries; curve i->j and j->i apart
                ux, uy = dx / dist, dy / dist
                sx, sy = x0 + ux * radii[i], y0 + uy * radii[i]
                ex, ey = x1 - ux * radii[j], y1 - uy * radii[j]
                mx, my = (sx + ex) / 2.0, (sy + ey) / 2.0
                off = 0.12 * dist
                qx, qy = mx - uy * off, my + ux * off
                body.append(
                    f'<path d="M {_fmt(sx)} {_fmt(sy)} Q {_fmt(qx)} {_fmt(qy)} '
                    f'{_fmt(ex)} {_fmt(ey)}" fill="none" stroke="#555" '
                    f'stroke-width="{_fmt(sw)}" marker-end="url(#arr)" class="edge"/>'
                )
                if self.edge_labels is not None:
                    lbl = self.edge_labels[i][j]
                    if lbl is not None and lbl != "":
                        body.append(
                            f'<text x="{_fmt(qx)}" y="{_fmt(qy)}" font-size="9" '
                            f'fill="#333" text-anchor="middle">{lbl}</text>'
                        )
        for i in range(n):
            cx, cy = P[i]
            fill = (
                _viridis(self.state_colors[i])
                if self.state_colors is not None
                else "rgb(141,160,203)"
            )
            body.append(
                f'<circle cx="{_fmt(cx)}" cy="{_fmt(cy)}" r="{_fmt(radii[i])}" '
                f'fill="{fill}" stroke="#333" stroke-width="1" class="node"/>'
            )
            body.append(
                f'<text x="{_fmt(cx)}" y="{_fmt(cy + 3)}" font-size="11" '
                f'text-anchor="middle" fill="#000">{self.state_labels[i]}</text>'
            )
        return _svg(size, size, body)


def plot_markov_model(msm_or_matrix, pos: Optional[np.ndarray] = None,
                      threshold: float = 1e-2, size: float = 400.0) -> str:
    """SVG of an MSM's transition graph (reference plots/network.py:444):
    edges are transition probabilities >= threshold labeled to two
    decimals, node areas proportional to the stationary distribution."""
    P = np.asarray(getattr(msm_or_matrix, "transition_matrix", msm_or_matrix), np.float64)
    pi = getattr(msm_or_matrix, "stationary_distribution", None)
    A = np.where(P >= threshold, P, 0.0)
    labels = [[f"{P[i, j]:.2f}" if A[i, j] else "" for j in range(P.shape[1])]
              for i in range(P.shape[0])]
    net = Network(A, positions=pos, state_sizes=pi, edge_labels=labels)
    return net.render(size=size)


def plot_flux(flux, state_labels: Optional[Sequence[str]] = None,
              size: float = 400.0) -> str:
    """SVG of a reactive flux network (reference plots/network.py:542):
    x positions ordered by the forward committor (the reference's
    default), node sizes by stationary distribution, edges = net fluxes,
    nodes colored by committor."""
    F_net = np.asarray(flux.net_flux, dtype=np.float64)
    q = np.asarray(flux.forward_committor, dtype=np.float64)
    n = F_net.shape[0]
    order = np.argsort(np.argsort(q, kind="stable"), kind="stable")
    x = 0.1 + 0.8 * (q - q.min()) / max(q.max() - q.min(), 1e-12)
    y = 0.15 + 0.7 * (order / max(n - 1, 1))
    pos = np.column_stack([x, y])
    pi = getattr(flux, "stationary_distribution", None)
    net = Network(F_net, positions=pos, state_sizes=pi,
                  state_labels=state_labels, state_colors=q)
    return net.render(size=size)


def _axes(width, height, pad, body, x_ticks, y_ticks, x_fmt=_fmt, y_fmt=_fmt):
    body.append(
        f'<line x1="{_fmt(pad)}" y1="{_fmt(height - pad)}" x2="{_fmt(width - pad / 2)}" '
        f'y2="{_fmt(height - pad)}" stroke="#000" stroke-width="1"/>'
    )
    body.append(
        f'<line x1="{_fmt(pad)}" y1="{_fmt(height - pad)}" x2="{_fmt(pad)}" '
        f'y2="{_fmt(pad / 2)}" stroke="#000" stroke-width="1"/>'
    )
    for xv, xp in x_ticks:
        body.append(
            f'<text x="{_fmt(xp)}" y="{_fmt(height - pad + 14)}" font-size="9" '
            f'text-anchor="middle">{x_fmt(xv)}</text>'
        )
    for yv, yp in y_ticks:
        body.append(
            f'<text x="{_fmt(pad - 4)}" y="{_fmt(yp + 3)}" font-size="9" '
            f'text-anchor="end">{y_fmt(yv)}</text>'
        )


def plot_implied_timescales(its, n_its: Optional[int] = None,
                            width: float = 480.0, height: float = 320.0) -> str:
    """SVG implied-timescales plot (reference plots/implied_timescales.py:12):
    one polyline per process over lagtime (log10 y), plus the shaded
    t = tau exclusion triangle below the identity line."""
    lags = np.asarray(its.lagtimes, dtype=np.float64)
    k = n_its if n_its is not None else its.max_n_processes
    curves = [np.asarray([its.timescales_for_process(p)[i] for i in range(len(lags))])
              for p in range(k)]
    pad = 40.0
    finite = np.concatenate([c[np.isfinite(c) & (c > 0)] for c in curves] + [lags])
    lo = max(min(finite.min(), lags.min()), 1e-3)
    hi = max(finite.max(), lags.max()) * 1.1
    ylo, yhi = math.log10(lo), math.log10(hi)

    def X(v):
        return pad + (v - lags.min()) / max(lags.max() - lags.min(), 1e-12) * (width - 1.5 * pad)

    def Y(v):
        t = (math.log10(max(v, lo)) - ylo) / max(yhi - ylo, 1e-12)
        return height - pad - t * (height - 1.5 * pad)

    body = [f'<rect width="{_fmt(width)}" height="{_fmt(height)}" fill="white"/>']
    # exclusion region: timescales below the identity t = tau are unresolved
    tri = " ".join(
        f"{_fmt(X(l))},{_fmt(Y(l))}" for l in lags
    ) + f" {_fmt(X(lags.max()))},{_fmt(height - pad)} {_fmt(X(lags.min()))},{_fmt(height - pad)}"
    body.append(f'<polygon points="{tri}" fill="#ddd" class="exclusion"/>')
    palette = ["#3b528b", "#21918c", "#5ec962", "#fde725", "#440154", "#b5de2b"]
    for p, c in enumerate(curves):
        pts = " ".join(
            f"{_fmt(X(l))},{_fmt(Y(v))}" for l, v in zip(lags, c) if np.isfinite(v) and v > 0
        )
        if pts:
            body.append(
                f'<polyline points="{pts}" fill="none" '
                f'stroke="{palette[p % len(palette)]}" stroke-width="2" class="its"/>'
            )
    _axes(width, height, pad, body,
          [(l, X(l)) for l in lags],
          [(10.0 ** t, Y(10.0 ** t)) for t in range(int(math.floor(ylo)), int(math.ceil(yhi)) + 1)])
    return _svg(width, height, body)


def plot_ck_test(ck, width_per: float = 140.0, height_per: float = 110.0) -> str:
    """SVG Chapman-Kolmogorov grid (reference plots/chapman_kolmogorov.py:97):
    an n x n grid of panels, each with the predicted (dashed) and
    estimated (solid) set-to-set probabilities over the lagtimes."""
    lags = np.asarray(ck.lagtimes, dtype=np.float64)
    n = np.asarray(ck.predictions[0]).shape[0]
    pad = 26.0
    W, H = n * width_per, n * height_per
    body = [f'<rect width="{_fmt(W)}" height="{_fmt(H)}" fill="white"/>']
    for i in range(n):
        for j in range(n):
            ox, oy = j * width_per, i * height_per

            def X(l):
                return ox + pad + (l - lags.min()) / max(lags.max() - lags.min(), 1e-12) * (width_per - 1.4 * pad)

            def Y(v):
                return oy + height_per - pad - max(0.0, min(1.0, v)) * (height_per - 1.4 * pad)

            pred = [float(np.asarray(ck.predictions[li])[i, j]) for li in range(len(lags))]
            est = [float(np.asarray(ck.estimates[li])[i, j]) for li in range(len(lags))]
            body.append(
                f'<rect x="{_fmt(ox + pad)}" y="{_fmt(oy + pad * 0.4)}" '
                f'width="{_fmt(width_per - 1.4 * pad)}" height="{_fmt(height_per - 1.8 * pad)}" '
                f'fill="none" stroke="#aaa" stroke-width="0.5"/>'
            )
            body.append(
                '<polyline points="'
                + " ".join(f"{_fmt(X(l))},{_fmt(Y(v))}" for l, v in zip(lags, pred))
                + '" fill="none" stroke="#3b528b" stroke-width="2" '
                'stroke-dasharray="4 3" class="predicted"/>'
            )
            body.append(
                '<polyline points="'
                + " ".join(f"{_fmt(X(l))},{_fmt(Y(v))}" for l, v in zip(lags, est))
                + '" fill="none" stroke="#21918c" stroke-width="2" class="estimated"/>'
            )
            body.append(
                f'<text x="{_fmt(ox + width_per / 2)}" y="{_fmt(oy + pad * 0.8)}" '
                f'font-size="10" text-anchor="middle">{i + 1} → {j + 1}</text>'
            )
    return _svg(W, H, body)


def plot_energy2d(landscape, width: float = 420.0, height: float = 360.0,
                  cbar: bool = True) -> str:
    """SVG free-energy heatmap (reference plots/energy.py:42): one colored
    cell per (x, y) bin of the energy landscape (inverted viridis — low
    energy bright), NaN/inf bins blank, plus a colorbar. Accepts either
    an object with ``.energies`` or the bare energy matrix the engine's
    operators/stats.py:energy2d returns."""
    E = np.asarray(getattr(landscape, "energies", landscape), dtype=np.float64)
    ny, nx = E.shape
    finite = E[np.isfinite(E)]
    lo, hi = (finite.min(), finite.max()) if finite.size else (0.0, 1.0)
    span = max(hi - lo, 1e-12)
    pad = 34.0
    plot_w = width - pad * (2.5 if cbar else 1.5)
    plot_h = height - 1.5 * pad
    cw, ch = plot_w / nx, plot_h / ny
    body = [f'<rect width="{_fmt(width)}" height="{_fmt(height)}" fill="white"/>']
    for iy in range(ny):
        for ix in range(nx):
            v = E[iy, ix]
            if not np.isfinite(v):
                continue
            t = 1.0 - (v - lo) / span  # low energy -> bright
            body.append(
                f'<rect x="{_fmt(pad + ix * cw)}" '
                f'y="{_fmt(height - pad - (iy + 1) * ch)}" '
                f'width="{_fmt(cw + 0.5)}" height="{_fmt(ch + 0.5)}" '
                f'fill="{_viridis(t)}" class="cell"/>'
            )
    if cbar:
        steps = 24
        bx = width - pad
        for s in range(steps):
            body.append(
                f'<rect x="{_fmt(bx)}" y="{_fmt(pad / 2 + (steps - 1 - s) * plot_h / steps)}" '
                f'width="10" height="{_fmt(plot_h / steps + 0.5)}" '
                f'fill="{_viridis(s / (steps - 1))}" class="cbar"/>'
            )
        body.append(
            f'<text x="{_fmt(bx + 12)}" y="{_fmt(pad / 2 + plot_h)}" font-size="9">{_fmt(hi)}</text>'
        )
        body.append(
            f'<text x="{_fmt(bx + 12)}" y="{_fmt(pad / 2 + 8)}" font-size="9">{_fmt(lo)}</text>'
        )
    return _svg(width, height, body)
