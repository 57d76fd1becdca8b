"""ITS / CK-test validation layer (reference util/validation.py semantics)."""

import numpy as np
import pytest

from deeptime_spark.data.schema import dtraj_from_arrays
from deeptime_spark.markov.msm import MarkovStateModel
from deeptime_spark.validation import (
    ChapmanKolmogorovTest,
    ImpliedTimescales,
    ck_test,
    fit_msms_at_lags,
    implied_timescales,
    implied_timescales_from_dtrajs,
)


@pytest.fixture(scope="module")
def markov_dtraj_df(spark):
    # exactly Markovian data from a two-block metastable chain whose slow
    # timescale (~10 steps) is well sampled by 4 x 8000 steps
    T = np.array(
        [
            [0.445, 0.45, 0.05, 0.055],
            [0.45, 0.445, 0.055, 0.05],
            [0.05, 0.055, 0.445, 0.45],
            [0.055, 0.05, 0.45, 0.445],
        ]
    )
    from deeptime_spark.data.generators import simulate_msm

    dtrajs = [simulate_msm(T, 8000, start=0, seed=s) for s in range(4)]
    return dtraj_from_arrays(spark, dtrajs), T


def test_implied_timescales_table_shape():
    T = np.array([[0.9, 0.1], [0.1, 0.9]])
    models = [MarkovStateModel(np.linalg.matrix_power(T, k), lagtime=k) for k in (1, 2, 3)]
    its = implied_timescales(models)
    assert its.n_lagtimes == 3
    np.testing.assert_array_equal(its.lagtimes, [1, 2, 3])
    # exactly Markovian: ITS must be lag-independent
    ts = its.timescales_for_process(0)
    np.testing.assert_allclose(ts, ts[0], rtol=1e-8)


def test_its_from_dtrajs_flat_for_markovian_data(spark, markov_dtraj_df):
    df, _ = markov_dtraj_df
    its = implied_timescales_from_dtrajs(df, lagtimes=[1, 2, 4], n_its=1)
    ts = its.timescales_for_process(0)
    assert np.all(np.isfinite(ts))
    # Markovian data: slowest ITS roughly constant across lagtimes
    assert np.max(ts) / np.min(ts) < 1.25


def test_ck_test_passes_for_markovian_data(spark, markov_dtraj_df):
    df, _ = markov_dtraj_df
    models = fit_msms_at_lags(df, [1, 2, 4])
    result = ck_test(models, n_metastable_sets=2)
    assert isinstance(result, ChapmanKolmogorovTest)
    np.testing.assert_array_equal(result.lagtimes, [0, 1, 2, 4])
    # lag0 entries are identity
    np.testing.assert_allclose(result.predictions[0], np.eye(2), atol=1e-12)
    np.testing.assert_allclose(result.estimates[0], np.eye(2), atol=1e-12)
    # Markovian data: predictions track estimates
    np.testing.assert_allclose(result.predictions[1:], result.estimates[1:], atol=0.06)


def test_ck_test_detects_non_markovian():
    # a model whose propagation deliberately disagrees with the estimates
    T1 = np.array([[0.9, 0.1], [0.1, 0.9]])
    bad = np.array([[0.5, 0.5], [0.5, 0.5]])
    models = [MarkovStateModel(T1, lagtime=1), MarkovStateModel(bad, lagtime=4)]
    res = ck_test(models, observable=None, n_metastable_sets=2)
    diff = np.abs(res.predictions[-1] - res.estimates[-1]).max()
    assert diff > 0.1
