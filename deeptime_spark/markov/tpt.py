"""Transition path theory (reactive flux).

Reference: markov/tools/flux/api.py:16-399 and the object API
markov/_reactive_flux.py:65-330. Implemented from the published TPT
formulas (Metzner, Schuette, Vanden-Eijnden, "Transition path theory for
Markov jump processes", MMS 7 (2009)): gross flux
f_ij = pi_i q-_i T_ij q+_j (i != j), net flux = (f - f^T)_+, total flux
F = sum_{i in A, j notin A} f_ij, rate k_AB = F / sum_i pi_i q-_i.
Driver-side (n x n).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from deeptime_spark.base import Model
from deeptime_spark.markov import analysis


class ReactiveFlux(Model):
    """Flux container (reference markov/_reactive_flux.py:65-330)."""

    def __init__(self, source_states, target_states, gross_flux, net_flux, stationary_distribution,
                 forward_committor, backward_committor, total_flux, rate, mfpt):
        self.source_states = source_states
        self.target_states = target_states
        self.gross_flux = gross_flux
        self.net_flux = net_flux
        self.stationary_distribution = stationary_distribution
        self.forward_committor = forward_committor
        self.backward_committor = backward_committor
        self.total_flux = total_flux
        self.rate = rate
        self.mfpt = mfpt

    def major_flux(self, fraction: float = 0.9) -> np.ndarray:
        """Subnetwork carrying ``fraction`` of the total flux
        (reference _reactive_flux.py:194-230): keep the largest net-flux
        edges until the fraction is reached."""
        f = self.net_flux.copy()
        order = np.argsort(f, axis=None)[::-1]
        kept = np.zeros_like(f)
        acc = 0.0
        target = fraction * self.total_flux
        for idx in order:
            if acc >= target or f.flat[idx] <= 0:
                break
            kept.flat[idx] = f.flat[idx]
            acc += f.flat[idx]
        return kept

    def pathways(self, fraction: float = 1.0, maxiter: int = 1000):
        """Dominant reaction pathway decomposition of the net flux
        (reference _reactive_flux.py:140-193)."""
        return pathways(self.net_flux, self.source_states, self.target_states,
                        fraction=fraction, maxiter=maxiter)

    def coarse_grain(self, sets: Sequence[np.ndarray]) -> "ReactiveFlux":
        """Aggregate flux over a state partition (reference :265-330)."""
        k = len(sets)
        F = np.zeros((k, k))
        for a, sa in enumerate(sets):
            for b, sb in enumerate(sets):
                if a != b:
                    F[a, b] = self.gross_flux[np.ix_(sa, sb)].sum()
        net = np.clip(F - F.T, 0.0, None)
        pi_c = np.array([self.stationary_distribution[s].sum() for s in sets])
        qp = np.array([
            float(np.dot(self.stationary_distribution[s], self.forward_committor[s]) / max(pi_c[i], 1e-300))
            for i, s in enumerate(sets)
        ])
        qm = np.array([
            float(np.dot(self.stationary_distribution[s], self.backward_committor[s]) / max(pi_c[i], 1e-300))
            for i, s in enumerate(sets)
        ])
        src = [i for i, s in enumerate(sets) if np.intersect1d(s, self.source_states).size]
        tgt = [i for i, s in enumerate(sets) if np.intersect1d(s, self.target_states).size]
        return ReactiveFlux(np.array(src), np.array(tgt), F, net, pi_c, qp, qm,
                            self.total_flux, self.rate, self.mfpt)


def _widest_path(F: np.ndarray, source: int, sink: int) -> Optional[list[int]]:
    """Maximin (widest-bottleneck) path via Dijkstra variant: the path
    from source to sink maximizing the minimum edge flux — the dominant
    pathway of the flux network (Metzner et al. 2009, sect. on pathway
    decomposition; reference flux/pathways.py finds the same bottleneck
    by edge bisection)."""
    n = F.shape[0]
    width = np.full(n, -np.inf)
    width[source] = np.inf
    prev = np.full(n, -1, dtype=int)
    visited = np.zeros(n, dtype=bool)
    for _ in range(n):
        u = -1
        best = -np.inf
        for v in range(n):
            if not visited[v] and width[v] > best:
                best = width[v]
                u = v
        if u < 0 or best <= 0:
            break
        if u == sink:
            path = [sink]
            while path[-1] != source:
                path.append(int(prev[path[-1]]))
            return path[::-1]
        visited[u] = True
        for v in np.nonzero(F[u] > 0)[0]:
            w = min(width[u], F[u, v])
            if w > width[v]:
                width[v] = w
                prev[v] = u
    return None


def pathways(F: np.ndarray, A: Sequence[int], B: Sequence[int],
             fraction: float = 1.0, maxiter: int = 1000, tol: float = 1e-14):
    """Decompose a net-flux network into dominant reaction pathways
    (reference flux/pathways.py:221-303): repeatedly extract the widest
    A->B path, record its capacity (minimum edge flux) and subtract it
    along the path, until ``fraction`` of the total flux is assembled.

    Returns (paths, capacities), dominant first. Ties between equal-
    bottleneck paths may resolve differently than the reference's
    bisection construction (documented deviation; capacities agree).
    """
    import warnings

    F = np.array(F, dtype=np.float64, copy=True)
    np.fill_diagonal(F, 0.0)
    n = F.shape[0]
    A = np.atleast_1d(np.asarray(A, dtype=int))
    B = np.atleast_1d(np.asarray(B, dtype=int))
    # artificial super-source / super-sink with infinite-capacity edges
    Fx = np.zeros((n + 2, n + 2))
    Fx[:n, :n] = F
    src, snk = n, n + 1
    total = F[A].sum()
    # endstate edges carry each state's total out/in flux (reference
    # add_endstates, pathways.py:150-219) and deplete with the real edges
    Fx[src, A] = F[A].sum(axis=1)
    Fx[B, snk] = F[:, B].sum(axis=0)
    paths, capacities = [], []
    accumulated = 0.0
    for _ in range(maxiter):
        if total <= 0 or accumulated >= fraction * total - tol * total:
            break
        p = _widest_path(Fx, src, snk)
        if p is None:
            break
        inner = p[1:-1]
        cap = min(Fx[p[i], p[i + 1]] for i in range(len(p) - 1))
        if cap <= tol:
            break
        for i in range(len(p) - 1):
            Fx[p[i], p[i + 1]] -= cap
        paths.append(np.array(inner))
        capacities.append(float(cap))
        accumulated += cap
    else:
        warnings.warn(
            f"pathway decomposition truncated at maxiter={maxiter} with "
            f"{accumulated / total:.3f} of the total flux assembled",
            RuntimeWarning,
        )
    return paths, capacities


def reactive_flux(
    T: np.ndarray,
    A: Sequence[int],
    B: Sequence[int],
    stationary_distribution: Optional[np.ndarray] = None,
) -> ReactiveFlux:
    """TPT A -> B (reference flux/api.py:16-110)."""
    T = np.asarray(T, dtype=np.float64)
    A = np.atleast_1d(np.asarray(A, dtype=int))
    B = np.atleast_1d(np.asarray(B, dtype=int))
    pi = stationary_distribution if stationary_distribution is not None else analysis.stationary_distribution(T)
    qplus = analysis.committor(T, A, B, forward=True)
    qminus = analysis.committor(T, A, B, forward=False, mu=pi)
    # gross flux, zero diagonal
    F = (pi * qminus)[:, None] * T * qplus[None, :]
    np.fill_diagonal(F, 0.0)
    net = np.clip(F - F.T, 0.0, None)
    notA = np.setdiff1d(np.arange(T.shape[0]), A)
    total = float(F[np.ix_(A, notA)].sum())
    denom = float(np.dot(pi, qminus))
    rate = total / denom if denom > 0 else 0.0
    mfpt = 1.0 / rate if rate > 0 else np.inf
    return ReactiveFlux(A, B, F, net, pi, qplus, qminus, total, rate, mfpt)
