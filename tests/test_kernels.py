"""Kernel library + kernel decomposition tests (reference tests/kernels,
tests/decomposition/test_kernel_* strategy)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deeptime_spark.data.schema import trajectory_from_arrays
from deeptime_spark.decomposition.kernel_methods import KVAD, KernelCCA, KernelEDMD
from deeptime_spark.kernels import (
    GaussianKernel,
    GeneralizedGaussianKernel,
    LaplacianKernel,
    PolynomialKernel,
    ProductKernel,
)


@pytest.mark.parametrize(
    "kernel",
    [
        GaussianKernel(1.3),
        GeneralizedGaussianKernel(np.array([0.7, 1.5, 2.0])),
        LaplacianKernel(0.9),
        PolynomialKernel(3, 0.5),
        ProductKernel(GaussianKernel(1.1), PolynomialKernel(2, 1.0)),
    ],
    ids=lambda k: type(k).__name__,
)
def test_expr_matches_numpy_apply(spark, rng, kernel):
    X = rng.normal(size=(20, 3))
    Y = rng.normal(size=(5, 3))
    df = spark.createDataFrame([(i, r.tolist()) for i, r in enumerate(X)], ["i", "x"])
    out = kernel.gram_df(df, Y, x_col="x", out_col="k").orderBy("i").collect()
    got = np.array([r["k"] for r in out])
    np.testing.assert_allclose(got, kernel.apply(X, Y), rtol=1e-10, atol=1e-12)


def test_gram_symmetry_and_diag(rng):
    X = rng.normal(size=(30, 2))
    G = GaussianKernel(1.0).gram(X)
    np.testing.assert_allclose(G, G.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(G), 1.0, atol=1e-8)


def _linear_two_state_trajs(rng, n_traj=6, length=400):
    """Metastable 1-d double-well-ish jump process: slow switching between
    centers at -1 and +1 with fast noise."""
    out = []
    for _ in range(n_traj):
        s = rng.integers(0, 2)
        xs = np.empty((length, 1))
        for t in range(length):
            if rng.random() < 0.02:
                s = 1 - s
            xs[t, 0] = (2 * s - 1) + 0.15 * rng.normal()
        out.append(xs)
    return out


def test_kernel_edmd_slow_eigenvalue(spark, rng):
    trajs = _linear_two_state_trajs(rng)
    df = trajectory_from_arrays(spark, trajs)
    est = KernelEDMD(GaussianKernel(0.5), epsilon=1e-3, n_eigs=3, max_samples=600)
    model = est.fit(df, lagtime=1).fetch_model()
    vals = np.abs(model.eigenvalues)
    # leading eigenvalue ~1 (stationary), second = slow switching process
    assert abs(vals[0] - 1.0) < 0.05
    assert 0.9 < vals[1] < 1.0
    # distributed out-of-sample evaluation matches the driver surface
    sample = np.array([[-1.0], [0.0], [1.0]])
    sdf = spark.createDataFrame([(i, r.tolist()) for i, r in enumerate(sample)], ["i", "x"])
    got = np.array([r["phi"] for r in model.transform_df(sdf).orderBy("i").collect()])
    np.testing.assert_allclose(got, np.real(model.transform(sample)), rtol=1e-8, atol=1e-10)


def test_kernel_cca_finds_correlated_components(spark, rng):
    trajs = _linear_two_state_trajs(rng)
    df = trajectory_from_arrays(spark, trajs)
    model = (
        KernelCCA(GaussianKernel(0.5), n_eigs=2, epsilon=1e-2, max_samples=500)
        .fit(df, lagtime=1)
        .fetch_model()
    )
    # leading canonical correlation close to 1 for a metastable process
    assert np.real(model.eigenvalues[0]) > 0.8


def test_kvad_scores_lag_consistency(spark, rng):
    trajs = _linear_two_state_trajs(rng)
    df = trajectory_from_arrays(spark, trajs)
    model = KVAD(GaussianKernel(1.0), lagtime=1, max_samples=500).fit(df).fetch_model()
    assert np.isfinite(model.score)
    assert model.koopman_matrix.shape[0] == len(model.singular_values) + 1
    assert np.all(model.singular_values >= -1e-10)
