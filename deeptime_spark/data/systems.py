"""SDE/ODE example systems — deeptime's data generator layer.

Reference: ``deeptime.data`` systems
(/root/reference/src/deeptime/data/_datasets.py:476-1093, _systems.py,
C++ drifts in src/include/deeptime/data/systems.h:54-420; Euler-Maruyama /
Runge-Kutta integrators in integrator.h).

Spark shape (SURVEY.md §2.1): a single trajectory is inherently
sequential — integrated in numpy on the driver or inside an executor —
while ENSEMBLES of trajectories are embarrassingly parallel over initial
conditions: ``trajectory_df`` ships the initial-condition table through
``mapInPandas`` so each partition integrates its own chains and yields
trajectory-schema rows (traj_id, t, x). ODE integration uses classic RK4
at fixed step (the reference uses an RK45 with fixed step too).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

TRAJ_SCHEMA = StructType(
    [
        StructField("traj_id", LongType()),
        StructField("t", LongType()),
        StructField("x", ArrayType(DoubleType())),
    ]
)


class System:
    """Base: drift ``f(x)``, optional constant diffusion matrix ``sigma``
    (None => deterministic ODE), integration step ``h`` and ``n_steps``
    sub-steps per recorded frame — mirroring the reference System API
    (data/_systems.py:8-287)."""

    def __init__(self, f: Callable, dim: int, sigma: Optional[np.ndarray], h: float, n_steps: int,
                 energy: Optional[Callable] = None, time_dependent: bool = False):
        self.f = f
        self.dim = dim
        self.sigma = None if sigma is None else np.atleast_2d(np.asarray(sigma, dtype=np.float64))
        self.h = float(h)
        self.n_steps = int(n_steps)
        self._energy = energy
        self.time_dependent = time_dependent

    @property
    def has_potential_function(self) -> bool:
        return self._energy is not None

    def potential(self, x) -> np.ndarray:
        if self._energy is None:
            raise ValueError("system has no potential function")
        return np.apply_along_axis(self._energy, -1, np.atleast_2d(np.asarray(x, dtype=np.float64)))

    def _step_block(self, x: np.ndarray, rng: Optional[np.random.Generator], t0: float) -> np.ndarray:
        """n_steps integrator sub-steps from state x (one recorded frame)."""
        h = self.h
        if self.time_dependent:
            f = self.f
        else:
            def f(t, y):
                return self.f(y)
        t = t0
        if self.sigma is None:
            for _ in range(self.n_steps):
                k1 = f(t, x)
                k2 = f(t + 0.5 * h, x + 0.5 * h * k1)
                k3 = f(t + 0.5 * h, x + 0.5 * h * k2)
                k4 = f(t + h, x + h * k3)
                x = x + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
                t += h
        else:
            sqh = np.sqrt(h)
            for _ in range(self.n_steps):
                x = x + h * f(t, x) + sqh * (self.sigma @ rng.normal(size=self.dim))
                t += h
        return x

    def trajectory(self, x0, length: int, seed: int = 42) -> np.ndarray:
        """(length, dim) trajectory from x0 (reference System.trajectory)."""
        rng = np.random.default_rng(seed)
        x = np.asarray(x0, dtype=np.float64).reshape(self.dim)
        out = np.empty((length, self.dim))
        out[0] = x
        for t in range(1, length):
            x = self._step_block(x, rng, t0=(t - 1) * self.h * self.n_steps)
            out[t] = x
        return out

    def trajectory_df(
        self, spark: SparkSession, x0s: Sequence, length: int, seed: int = 42
    ) -> DataFrame:
        """Ensemble integration, parallel over initial conditions: one
        mapInPandas over the x0 table; each chain integrates sequentially
        inside its executor and emits trajectory-schema rows."""
        import pandas as pd

        x0s = np.atleast_2d(np.asarray(x0s, dtype=np.float64))
        init = spark.createDataFrame(
            [(int(i), row.tolist()) for i, row in enumerate(x0s)], ["traj_id", "x0"]
        ).repartition(min(len(x0s), 64))
        sys_ref = self

        def integrate(batches):
            for pdf in batches:
                frames = []
                for _, row in pdf.iterrows():
                    tid = int(row["traj_id"])
                    traj = sys_ref.trajectory(np.array(row["x0"]), length, seed=seed + tid)
                    frames.append(
                        pd.DataFrame(
                            {
                                "traj_id": tid,
                                "t": np.arange(length, dtype=np.int64),
                                "x": list(traj),
                            }
                        )
                    )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        return init.mapInPandas(integrate, schema=TRAJ_SCHEMA)


# ------------------------------------------------------------------ SDEs
# Drifts re-expressed from the published potentials; parameter values match
# the reference systems.h definitions (cited per system).


def ornstein_uhlenbeck(h: float = 1e-3, n_steps: int = 500) -> System:
    """1-d OU process dx = -alpha x dt + sqrt(2/beta) dW with alpha=1,
    beta=4 (reference systems.h:183-208, _datasets.py:735)."""
    alpha, beta = 1.0, 4.0
    return System(
        f=lambda x: -alpha * x,
        dim=1,
        sigma=[[2.0 / beta]],
        h=h,
        n_steps=n_steps,
        energy=lambda x: 0.5 * alpha * float(x[0]) ** 2,
    )


def prinz_potential(h: float = 1e-5, n_steps: int = 500, temperature_factor: float = 1.0,
                    mass: float = 1.0, damping: float = 1.0) -> System:
    """Four-well Prinz potential (reference systems.h:211-242,
    _datasets.py:784; Prinz et al. JCP 134, 174105 (2011))."""
    md = mass * damping

    def drift(x):
        v = x[0]
        return np.array(
            [
                -4.0
                / md
                * (
                    8.0 * v**7
                    - 128.0 * np.exp(-80.0 * v * v) * v
                    - 32.0 * np.exp(-80.0 * (v - 0.5) ** 2) * (v - 0.5)
                    - 40.0 * np.exp(-40.0 * (v + 0.5) ** 2) * (v + 0.5)
                )
            ]
        )

    def energy(x):
        v = float(x[0])
        return 4.0 / md * (
            v**8 + 0.8 * np.exp(-80.0 * v * v) + 0.2 * np.exp(-80.0 * (v - 0.5) ** 2)
            + 0.5 * np.exp(-40.0 * (v + 0.5) ** 2)
        )

    sigma = np.sqrt(2.0 * temperature_factor / md)
    return System(f=drift, dim=1, sigma=[[sigma]], h=h, n_steps=n_steps, energy=energy)


def triple_well_1d(h: float = 1e-3, n_steps: int = 500) -> System:
    """1-d triple well on [0, 6] (reference systems.h:248-276)."""

    def drift(x):
        v = x[0]
        return np.array(
            [
                -1.0
                * (
                    -24.82002100
                    + 82.85029600 * v
                    - 82.6031550 * v * v
                    + 34.125104 * v**3
                    - 6.20030 * v**4
                    + 0.4104 * v**5
                )
            ]
        )

    def energy(x):
        v = float(x[0])
        return -(24.82 * v - 41.4251 * v**2 + 27.5344 * v**3 - 8.53128 * v**4
                 + 1.24006 * v**5 - 0.0684 * v**6) + 5.0

    return System(f=drift, dim=1, sigma=[[0.75]], h=h, n_steps=n_steps, energy=energy)


def double_well_2d(h: float = 1e-3, n_steps: int = 10000, temperature_factor: float = 1.0,
                   mass: float = 1.0, damping: float = 1.0) -> System:
    """V = (x^2-1)^2 + y^2 (reference systems.h:279-308)."""
    s = np.sqrt(0.5 * temperature_factor / (mass * damping))
    return System(
        f=lambda x: np.array([-4.0 * x[0] ** 3 + 4.0 * x[0], -2.0 * x[1]]),
        dim=2,
        sigma=np.diag([s, s]),
        h=h,
        n_steps=n_steps,
        energy=lambda x: (x[0] ** 2 - 1.0) ** 2 + x[1] ** 2,
    )


def quadruple_well(h: float = 1e-3, n_steps: int = 10000) -> System:
    """V = (x^2-1)^2 + (y^2-1)^2, sigma = sqrt(.5) I
    (reference systems.h:315-336, _datasets.py:476)."""
    s = np.sqrt(0.5)
    return System(
        f=lambda x: np.array([-4.0 * x[0] ** 3 + 4.0 * x[0], -4.0 * x[1] ** 3 + 4.0 * x[1]]),
        dim=2,
        sigma=np.diag([s, s]),
        h=h,
        n_steps=n_steps,
        energy=lambda x: (x[0] ** 2 - 1.0) ** 2 + (x[1] ** 2 - 1.0) ** 2,
    )


def quadruple_well_asymmetric(h: float = 1e-3, n_steps: int = 10000) -> System:
    """Asymmetric quadruple well (reference systems.h:342-368)."""

    def drift(x):
        return np.array(
            [
                -4 * x[0] ** 3 + (3.0 / 16.0) * x[0] ** 2 + 4 * x[0] - 3.0 / 16.0,
                -4 * x[1] ** 3 + (3.0 / 8.0) * x[1] ** 2 + 4 * x[1] - 3.0 / 8.0,
            ]
        )

    def energy(x):
        return (
            x[0] ** 4 - (1.0 / 16.0) * x[0] ** 3 - 2.0 * x[0] ** 2 + (3.0 / 16.0) * x[0]
            + x[1] ** 4 - (1.0 / 8.0) * x[1] ** 3 - 2.0 * x[1] ** 2 + (3.0 / 8.0) * x[1]
        )

    return System(f=drift, dim=2, sigma=np.diag([0.6, 0.6]), h=h, n_steps=n_steps, energy=energy)


def triple_well_2d(h: float = 1e-5, n_steps: int = 10000) -> System:
    """2-d three-well potential (reference systems.h:370-420)."""

    def drift(x):
        xv, yv = x[0], x[1]
        e1 = np.exp(-xv * xv - (yv - 1.0 / 3) ** 2)
        e2 = np.exp(-xv * xv - (yv - 5.0 / 3) ** 2)
        e3 = np.exp(-((xv - 1.0) ** 2) - yv * yv)
        e4 = np.exp(-((xv + 1.0) ** 2) - yv * yv)
        dx = -(3 * e1 * (-2 * xv) - 3 * e2 * (-2 * xv) - 5 * e3 * (-2 * (xv - 1.0))
               - 5 * e4 * (-2 * (xv + 1.0)) + 0.8 * xv**3)
        dy = -(3 * e1 * (-2 * (yv - 1.0 / 3)) - 3 * e2 * (-2 * (yv - 5.0 / 3))
               - 5 * e3 * (-2 * yv) - 5 * e4 * (-2 * yv) + 0.8 * (yv - 1.0 / 3) ** 3)
        return np.array([dx, dy])

    def energy(x):
        xv, yv = float(x[0]), float(x[1])
        return (
            3 * np.exp(-xv * xv - (yv - 1.0 / 3) ** 2)
            - 3 * np.exp(-xv * xv - (yv - 5.0 / 3) ** 2)
            - 5 * np.exp(-((xv - 1.0) ** 2) - yv * yv)
            - 5 * np.exp(-((xv + 1.0) ** 2) - yv * yv)
            + 0.2 * xv**4
            + 0.2 * (yv - 1.0 / 3) ** 4
        )

    return System(f=drift, dim=2, sigma=np.diag([1.09, 1.09]), h=h, n_steps=n_steps, energy=energy)


# ------------------------------------------------------------------ ODEs


def abc_flow(h: float = 1e-3, n_steps: int = 1000) -> System:
    """Arnold-Beltrami-Childress flow, a=sqrt(3), b=sqrt(2), c=1
    (reference systems.h:54-79)."""
    a, b, c = np.sqrt(3.0), np.sqrt(2.0), 1.0
    return System(
        f=lambda x: np.array(
            [
                a * np.sin(x[2]) + c * np.cos(x[1]),
                b * np.sin(x[0]) + a * np.cos(x[2]),
                c * np.sin(x[1]) + b * np.cos(x[0]),
            ]
        ),
        dim=3,
        sigma=None,
        h=h,
        n_steps=n_steps,
    )


def lorenz_system(h: float = 1e-3, n_steps: int = 1000) -> System:
    """Lorenz attractor, sigma=10, rho=28, beta=8/3
    (reference systems.h:82-107)."""
    s, rho, beta = 10.0, 28.0, 8.0 / 3.0
    return System(
        f=lambda x: np.array(
            [s * (x[1] - x[0]), x[0] * (rho - x[2]) - x[1], x[0] * x[1] - beta * x[2]]
        ),
        dim=3,
        sigma=None,
        h=h,
        n_steps=n_steps,
    )


def thomas_attractor(b: float = 0.208186, h: float = 1e-2, n_steps: int = 100) -> System:
    """Thomas' cyclically symmetric attractor (reference systems.h:110-133)."""
    return System(
        f=lambda x: np.array(
            [
                np.sin(x[1]) - b * x[0],
                np.sin(x[2]) - b * x[1],
                np.sin(x[0]) - b * x[2],
            ]
        ),
        dim=3,
        sigma=None,
        h=h,
        n_steps=n_steps,
    )


def bickley_jet(h: float = 1e-2, n_steps: int = 10) -> System:
    """Bickley jet — idealized quasi-periodic zonal flow (reference
    systems.h:135-180; Rypina et al. 2007): particles advect in the
    time-dependent stream function with U0=5.4138, L0=1.77, r0=6.371,
    three Rossby-wave perturbations. Positions are taken modulo the
    [0, 20] x-period downstream, matching the periodic boundary."""
    U0, L0, r0 = 5.4138, 1.77, 6.371
    eps = np.array([0.075, 0.15, 0.3])
    c = U0 * np.array([0.1446, 0.205, 0.461])
    k = np.array([2.0, 4.0, 6.0]) / r0

    def f(t, xv):
        x = np.mod(xv[0], 20.0)
        y = xv[1]
        phase = np.exp(-1j * k * c * t) * np.exp(1j * k * x)
        fc = np.sum(eps * phase)
        df_dx = np.sum(eps * phase * 1j * k)
        sech_y = 1.0 / np.cosh(y / L0)
        s2 = sech_y * sech_y
        return np.array(
            [
                U0 * s2 + 2.0 * U0 * np.tanh(y / L0) * s2 * fc.real,
                U0 * L0 * s2 * df_dx.real,
            ]
        )

    return System(f=f, dim=2, sigma=None, h=h, n_steps=n_steps, time_dependent=True)


def time_dependent_quintuple_well(h: float = 1e-5, n_steps: int = 10000, beta: float = 5.0) -> System:
    """Rotating five-well SDE (reference systems.h:415-456): wells orbit
    with period 2 in a breathing ring potential; diffusion sqrt(2/beta)."""
    s = 5.0

    def f(t, xvec):
        x, y = xvec[0], xvec[1]
        r2 = x * x + y * y
        r = np.sqrt(r2)
        ang = np.arctan2(y, x)
        common = -np.sin(2 * np.pi * t) + 2 * r - 3
        fx = (s * y * np.sin(0.5 * np.pi * t - s * ang) - 10.0 * x * r * common) / r2
        fy = -(s * x * np.sin(0.5 * np.pi * t - s * ang) + 10.0 * y * r * common) / r2
        return np.array([fx, fy])

    def energy(x, t=0.0):
        term1 = np.cos(s * np.arctan2(x[1], x[0]) - 0.5 * np.pi * t)
        term2 = np.sqrt(x[0] ** 2 + x[1] ** 2) - 1.5 - 0.5 * np.sin(2 * np.pi * t)
        return term1 + 10 * term2 * term2

    sig = np.sqrt(2.0 / beta)
    return System(
        f=f, dim=2, sigma=np.diag([sig, sig]), h=h, n_steps=n_steps,
        energy=energy, time_dependent=True,
    )


def custom_sde(dim: int, rhs: Callable, sigma, h: float = 1e-3, n_steps: int = 1) -> System:
    """User-defined SDE (reference _datasets.py:1094-1176)."""
    return System(f=rhs, dim=dim, sigma=sigma, h=h, n_steps=n_steps)


def custom_ode(dim: int, rhs: Callable, h: float = 1e-3, n_steps: int = 1) -> System:
    """User-defined ODE (reference _datasets.py:1177-1240)."""
    return System(f=rhs, dim=dim, sigma=None, h=h, n_steps=n_steps)
