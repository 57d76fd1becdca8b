"""Example datasets: hidden-state emission models and gridworld walks.

Reference: ``ellipsoids`` (/root/reference/src/deeptime/data/_ellipsoids.py),
``sqrt_model`` / ``swissroll_model`` (data/_datasets.py:349-475),
``drunkards_walk`` (data/_drunkards_walk_simulator.py:11-406).

All generators are seeded and emit either numpy arrays (driver fixtures)
or trajectory-schema DataFrames (ensembles via the systems.py mapInPandas
path is unnecessary here — these are cheap driver simulations written
once as parquet-able frames).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from deeptime_spark.markov.msm import MarkovStateModel


class Ellipsoids:
    """Two-state lazy Markov chain with strongly correlated 2-d Gaussian
    emissions (reference _ellipsoids.py:8-100): P = [[lam, 1-lam],
    [1-lam, lam]], means (0,0)/(0,5), covariance [[5.7, 5.65],[5.65, 5.7]]."""

    state_0_mean = np.array([0.0, 0.0])
    state_1_mean = np.array([0.0, 5.0])

    def __init__(self, laziness: float = 0.97, seed: Optional[int] = None):
        if laziness <= 0.5 or laziness > 1.0:
            raise ValueError(f"laziness must be in (0.5, 1] but was {laziness}")
        self.laziness = laziness
        self.seed = seed
        self.msm = MarkovStateModel(
            np.array([[laziness, 1 - laziness], [1 - laziness, laziness]]), lagtime=1
        )
        self.cov = np.array([[5.7, 5.65], [5.65, 5.7]])

    def observations(self, n_steps: int, seed: Optional[int] = None) -> np.ndarray:
        """(n_steps, 2) emission trajectory (reference :observations)."""
        seed = self.seed if seed is None else seed
        rng = np.random.default_rng(seed)
        dtraj = self.msm.simulate(n_steps, seed=seed or 42)
        means = np.stack([self.state_0_mean, self.state_1_mean])
        noise = rng.multivariate_normal(np.zeros(2), self.cov, size=n_steps)
        return means[dtraj] + noise, dtraj


def sqrt_model(n_samples: int, seed: Optional[int] = None):
    """Two-state HMM with sqrt-masked 2-d emissions so the metastable
    states are NOT linearly separable (reference _datasets.py:349-404):
    P = [[.95,.05],[.05,.95]], means (0,±1), cov diag(30, 0.015), then
    (x, y) -> (x, y + sqrt|x|). Returns (dtraj, traj)."""
    T = np.array([[0.95, 0.05], [0.05, 0.95]])
    states = np.array([[0.0, 1.0], [0.0, -1.0]])
    cov = np.array([[30.0, 0.0], [0.0, 0.015]])
    msm = MarkovStateModel(T, lagtime=1)
    dtraj = msm.simulate(n_samples, seed=seed or 42)
    rng = np.random.default_rng(seed)
    traj = states[dtraj] + rng.multivariate_normal(np.zeros(2), cov, size=n_samples)
    traj[:, 1] += np.sqrt(np.abs(traj[:, 0]))
    return dtraj, traj


def swissroll_model(n_samples: int, seed: Optional[int] = None):
    """Four-state HMM rolled onto a 3-d swiss roll so states are not
    linearly separable (reference _datasets.py:406-475). Returns
    (dtraj, traj)."""
    T = np.array(
        [
            [0.9, 0.1, 0.0, 0.0],
            [0.1, 0.8, 0.1, 0.0],
            [0.0, 0.1, 0.8, 0.1],
            [0.0, 0.0, 0.1, 0.9],
        ]
    )
    means = np.array([[7.5, 7.5], [7.5, 15.0], [15.0, 15.0], [15.0, 7.5]])
    cov = 1.0 * np.eye(2)
    msm = MarkovStateModel(T, lagtime=1)
    dtraj = msm.simulate(n_samples, seed=seed or 42)
    rng = np.random.default_rng(seed)
    latent = means[dtraj] + rng.multivariate_normal(np.zeros(2), cov, size=n_samples)
    phi = latent[:, 0]
    traj = np.stack([phi * np.cos(phi), latent[:, 1], phi * np.sin(phi)], axis=1)
    return dtraj, traj


class DoubleWellDiscrete:
    """Discretized 1-d double-well trajectory (reference
    data/_datasets.py:14-28, _double_well.py): the bundled dataset is a
    100k-step dtraj of a double-well diffusion discretized into 100 uniform
    bins. The reference ships a fixed .npz; here the trajectory is
    REGENERATED deterministically from the double-well SDE + box
    discretization (documented deviation: statistically equivalent, not the
    identical byte stream)."""

    def __init__(self, n_steps: int = 100_000, seed: int = 42, n_bins: int = 100):
        from deeptime_spark.data.systems import System

        self.n_bins = n_bins
        # classic 1-d double well dV/dx with V = (x^2-1)^2, kT tuned so
        # both wells are visited within 100k steps
        sys = System(
            f=lambda x: np.array([-4.0 * x[0] ** 3 + 4.0 * x[0]]),
            dim=1,
            sigma=[[0.9]],
            h=1e-2,
            n_steps=10,
            energy=lambda x: (x[0] ** 2 - 1.0) ** 2,
        )
        traj = sys.trajectory([1.0], n_steps, seed=seed)[:, 0]
        lo, hi = -1.8, 1.8
        bins = np.clip(((traj - lo) / (hi - lo) * n_bins).astype(int), 0, n_bins - 1)
        self.trajectory = traj
        self.dtraj = bins

    @property
    def dtraj_n6good(self) -> np.ndarray:
        """6-state coarse version (reference exposes coarse groupings)."""
        return (self.dtraj * 6) // self.n_bins

    def analytic_msm(self, lagtime: int = 1) -> MarkovStateModel:
        """MSM estimated from the generated trajectory at the given lag."""
        from deeptime_spark.markov.msm import transition_matrix_reversible

        n = self.n_bins
        C = np.zeros((n, n))
        np.add.at(C, (self.dtraj[:-lagtime], self.dtraj[lagtime:]), 1.0)
        keep = C.sum(axis=1) > 0
        idx = np.where(keep)[0]
        T = transition_matrix_reversible(C[np.ix_(idx, idx)] + 1e-8)
        return MarkovStateModel(T, lagtime=lagtime)


class DrunkardsWalk:
    """2-d gridworld random walk with absorbing home/bar states
    (reference _drunkards_walk_simulator.py:11-406): uniform jumps within
    the 3x3 stencil clipped at grid edges; point (i, j) is state i + n*j.
    Barriers are blocked (or ``weight``-penalized) cells."""

    def __init__(
        self,
        grid_size: Tuple[int, int] = (10, 10),
        bar_location: Tuple[int, int] = (9, 9),
        home_location: Tuple[int, int] = (0, 0),
        barriers: Optional[List[Tuple[int, int]]] = None,
    ):
        self.grid_size = grid_size
        self.bar_location = tuple(bar_location)
        self.home_location = tuple(home_location)
        self.barriers: List[Tuple[int, int]] = []
        self.barrier_weights: List[Optional[float]] = []
        for b in barriers or []:
            self.barriers.append(tuple(b))
            self.barrier_weights.append(None)
        self._msm = None

    @property
    def n_states(self) -> int:
        return self.grid_size[0] * self.grid_size[1]

    def coordinate_to_state(self, coord) -> int:
        return int(coord[0]) + self.grid_size[0] * int(coord[1])

    def state_to_coordinate(self, state: int) -> Tuple[int, int]:
        return state % self.grid_size[0], state // self.grid_size[0]

    def add_barrier(self, begin, end, weight: Optional[float] = None) -> None:
        """Add barrier cells on the line from begin to end (reference
        :104-147; hard when weight is None, else transition probability
        divided by ``weight``)."""
        begin, end = np.asarray(begin), np.asarray(end)
        n = int(max(np.abs(end - begin))) + 1
        for s in np.linspace(0.0, 1.0, n):
            cell = tuple(np.round(begin + s * (end - begin)).astype(int))
            if cell not in self.barriers:
                self.barriers.append(cell)
                self.barrier_weights.append(weight)
        self._msm = None

    @property
    def msm(self) -> MarkovStateModel:
        if self._msm is None:
            n, m = self.grid_size
            P = np.zeros((self.n_states, self.n_states))
            absorbing = {self.coordinate_to_state(self.bar_location),
                         self.coordinate_to_state(self.home_location)}
            barrier_lookup = {tuple(b): w for b, w in zip(self.barriers, self.barrier_weights)}
            for i in range(n):
                for j in range(m):
                    s = self.coordinate_to_state((i, j))
                    if s in absorbing:
                        P[s, s] = 1.0
                        continue
                    weights = {}
                    for di in (-1, 0, 1):
                        for dj in (-1, 0, 1):
                            if di == 0 and dj == 0:
                                continue
                            ni, nj = i + di, j + dj
                            if not (0 <= ni < n and 0 <= nj < m):
                                continue
                            w = 1.0
                            bw = barrier_lookup.get((ni, nj), 1.0)
                            if bw is None:
                                continue  # hard barrier: jump forbidden
                            w /= bw
                            weights[self.coordinate_to_state((ni, nj))] = w
                    total = sum(weights.values())
                    for t, w in weights.items():
                        P[s, t] = w / total
            self._msm = MarkovStateModel(P, lagtime=1)
        return self._msm

    def walk(self, start, n_steps: int, seed: int = 42, stop: bool = True) -> np.ndarray:
        """Simulate a walk, optionally stopping at home/bar (reference
        :240-280). Returns (length, 2) coordinates."""
        dtraj = self.msm.simulate(n_steps, start=self.coordinate_to_state(start), seed=seed)
        coords = np.array([self.state_to_coordinate(s) for s in dtraj])
        if stop:
            absorbing = {self.coordinate_to_state(self.bar_location),
                         self.coordinate_to_state(self.home_location)}
            for k, s in enumerate(dtraj):
                if s in absorbing:
                    return coords[: k + 1]
        return coords
