"""Graph connectivity on small driver-side matrices (no scipy in this
environment). Kosaraju/iterative-DFS strongly connected components and BFS
weak components over a boolean adjacency matrix — the count-graph analogue
of the reference's scipy.csgraph usage
(/root/reference/src/deeptime/markov/tools/estimation/api.py:410-461).
State counts are small (<= a few thousand) so O(n^2) adjacency is fine; the
*data* never comes here, only the collected count matrix.
"""

from __future__ import annotations

import numpy as np


def _neighbors(adj: np.ndarray) -> list[np.ndarray]:
    return [np.nonzero(adj[i])[0] for i in range(adj.shape[0])]


def strongly_connected_components(adj: np.ndarray) -> list[np.ndarray]:
    """Kosaraju with iterative DFS; components returned largest-first."""
    n = adj.shape[0]
    out = _neighbors(adj)
    order: list[int] = []
    seen = np.zeros(n, dtype=bool)
    for s in range(n):
        if seen[s]:
            continue
        stack = [(s, 0)]
        seen[s] = True
        while stack:
            v, ptr = stack.pop()
            if ptr < len(out[v]):
                stack.append((v, ptr + 1))
                w = out[v][ptr]
                if not seen[w]:
                    seen[w] = True
                    stack.append((int(w), 0))
            else:
                order.append(v)
    inc = _neighbors(adj.T)
    comp = -np.ones(n, dtype=int)
    c = 0
    for s in reversed(order):
        if comp[s] >= 0:
            continue
        stack2 = [s]
        comp[s] = c
        while stack2:
            v = stack2.pop()
            for w in inc[v]:
                if comp[w] < 0:
                    comp[w] = c
                    stack2.append(int(w))
        c += 1
    comps = [np.where(comp == i)[0] for i in range(c)]
    comps.sort(key=lambda a: -len(a))
    return comps


def weakly_connected_components(adj: np.ndarray) -> list[np.ndarray]:
    sym = adj | adj.T
    n = sym.shape[0]
    comp = -np.ones(n, dtype=int)
    c = 0
    for s in range(n):
        if comp[s] >= 0:
            continue
        stack = [s]
        comp[s] = c
        while stack:
            v = stack.pop()
            for w in np.nonzero(sym[v])[0]:
                if comp[w] < 0:
                    comp[w] = c
                    stack.append(int(w))
        c += 1
    comps = [np.where(comp == i)[0] for i in range(c)]
    comps.sort(key=lambda a: -len(a))
    return comps


def connected_components(adj: np.ndarray, directed: bool = True) -> list[np.ndarray]:
    adj = np.asarray(adj, dtype=bool)
    return strongly_connected_components(adj) if directed else weakly_connected_components(adj)
