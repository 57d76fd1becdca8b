"""covar/covars conveniences, logsumexp aggregates, Koopman expectation."""

import numpy as np

from deeptime_spark.data.schema import trajectory_from_arrays


def test_covar_covars_conveniences(spark, rng):
    from deeptime_spark.covariance import covar, covars

    data = [rng.normal(size=(800, 3)) for _ in range(2)]
    df = trajectory_from_arrays(spark, data)
    C = covar(df)
    X = np.concatenate(data)
    np.testing.assert_allclose(C, np.cov(X.T, ddof=1), rtol=1e-9)
    c00, c0t = covars(df, lagtime=2)
    assert c00.shape == (3, 3) and c0t.shape == (3, 3)
    # instantaneous part of the lagged pass matches within pair-truncation
    np.testing.assert_allclose(c00, C, atol=0.05)


def test_logsumexp_aggregates(spark, rng):
    from deeptime_spark.operators.aggregates import grouped_logsumexp, logsumexp

    vals = rng.normal(loc=0, scale=50, size=500)  # big spread: naive exp overflows
    groups = rng.integers(0, 3, size=500)
    df = spark.createDataFrame(
        [(int(g), float(v)) for g, v in zip(groups, vals)], ["g", "v"]
    )
    got = {r["g"]: r["logsumexp"] for r in grouped_logsumexp(df, "v", ["g"]).collect()}
    for g in range(3):
        x = vals[groups == g]
        m = x.max()
        expected = m + np.log(np.sum(np.exp(x - m)))
        assert abs(got[g] - expected) < 1e-9
    m = vals.max()
    assert abs(logsumexp(df, "v") - (m + np.log(np.sum(np.exp(vals - m))))) < 1e-9


def test_logsumexp_null_and_empty(spark):
    """Nulls are skipped (all-null partitions included); empty input is
    -inf, matching the classic global-shift formulation."""
    from deeptime_spark.operators.aggregates import logsumexp

    df = spark.createDataFrame(
        [(None,), (1.0,), (None,), (2.0,)], "v double"
    ).repartition(4)
    expected = np.log(np.exp(1.0) + np.exp(2.0))
    assert abs(logsumexp(df, "v") - expected) < 1e-12
    assert logsumexp(spark.createDataFrame([], "v double"), "v") == float("-inf")
    assert logsumexp(
        spark.createDataFrame([(None,), (None,)], "v double"), "v"
    ) == float("-inf")


def test_koopman_expectation_lag_multiple(spark, rng):
    from deeptime_spark.decomposition.vamp import VAMP

    # AR(1): observable expectation relaxes toward the stationary mean
    trajs = []
    for _ in range(4):
        x = np.zeros((2000, 2)) + 3.0  # start away from equilibrium mean 0
        for t in range(1, 2000):
            x[t] = 0.9 * x[t - 1] + 0.44 * rng.normal(size=2)
        trajs.append(x)
    df = trajectory_from_arrays(spark, trajs)
    model = VAMP(lagtime=1).fit(df).fetch_model()
    obs = np.array([[1.0], [0.0]])  # first coordinate
    e1 = model.expectation(obs, lag_multiple=1)
    e5 = model.expectation(obs, lag_multiple=5)
    assert np.isfinite(e1).all() and np.isfinite(e5).all()
    # covariance prediction at lag multiples decays for a mixing process
    cov1 = model.expectation(obs, statistics=obs, lag_multiple=1, observables_mean_free=True,
                             statistics_mean_free=True)
    cov8 = model.expectation(obs, statistics=obs, lag_multiple=8, observables_mean_free=True,
                             statistics_mean_free=True)
    assert abs(cov8[0, 0]) < abs(cov1[0, 0])


def test_progress_callback_interface():
    from deeptime_spark.callbacks import ProgressCallback, supports_progress_interface

    ticks = []

    class Bar:
        def __init__(self, total=None):
            self.total = total
            self.n = 0

        def update(self, inc=1):
            self.n += inc
            ticks.append(inc)

        def set_description(self, v):
            self.desc = v

        def close(self):
            self.closed = True

    with ProgressCallback(Bar, desc="work", total=3) as cb:
        assert supports_progress_interface(cb.progress_bar)
        cb()
        cb(2)
    assert ticks == [1, 2]
    assert cb.progress_bar.closed
    assert cb.progress_bar.desc == "work"


def test_progress_callback_in_hmm_fit(spark):
    import numpy as np

    from deeptime_spark.data.schema import dtraj_from_arrays
    from deeptime_spark.hmm import MaximumLikelihoodHMM, init_discrete_metastable_from_data

    rng = np.random.default_rng(5)
    dtrajs = [rng.integers(0, 3, size=200) for _ in range(3)]
    df = dtraj_from_arrays(spark, dtrajs)
    init = init_discrete_metastable_from_data(df, n_hidden_states=2, lagtime=1)

    seen = []

    class Bar:
        def __init__(self, total=None):
            self.total = total
            self.n = 0

        def update(self, inc=1):
            self.n += inc
            seen.append(self.n)

        def set_description(self, v):
            pass

        def close(self):
            pass

    MaximumLikelihoodHMM(init, lagtime=1, maxit=2).fit(df, progress=Bar)
    assert seen == [1, 2]


def test_kahan_sum_and_dot():
    import numpy as np

    from deeptime_spark.numeric.kahan import kdot, ksum

    # pathological cancellation: naive fp sum loses the small term
    arr = np.array([1e16, 1.0, -1e16, 1.0])
    assert ksum(arr) == 2.0
    rng = np.random.default_rng(4)
    A, B = rng.normal(size=(3, 5)), rng.normal(size=(5, 2))
    np.testing.assert_allclose(kdot(A, B), A @ B, rtol=1e-12)


def test_approx_sketches_within_bounds(spark):
    """The approximate aggregation surface (SURVEY §2.14): HLL distinct
    counts and approx percentiles land within their documented error
    bounds against the exact answers on harness events. (Approx sketches
    are engine-specific, so they live under pytest bounds, not the
    DuckDB value-hash gate.)"""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    row = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.percentile_approx("value", [0.25, 0.5, 0.75], 10_000).alias("approx_q"),
        F.expr("percentile(value, array(0.25, 0.5, 0.75))").alias("exact_q"),
    ).collect()[0]
    assert abs(row["approx_users"] - row["exact_users"]) <= 0.06 * row["exact_users"]
    for a, e in zip(row["approx_q"], row["exact_q"]):
        assert abs(a - e) <= max(0.05 * abs(e), 1e-9)


# ------------------------------------------------------- funnel stages


def test_funnel_strict_progression_and_window(spark):
    import datetime as dt

    from deeptime_spark.operators.stats import funnel_stages

    t0 = dt.datetime(2026, 1, 1)

    def ev(uid, typ, minutes):
        return (uid, typ, t0 + dt.timedelta(minutes=minutes))

    rows = [
        # user 1: full funnel in order
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # user 2: purchase BEFORE click -> stops at stage 2
        ev(2, "view", 0), ev(2, "purchase", 5), ev(2, "click", 10),
        # user 3: click only -> stage 0 (no view)
        ev(3, "click", 0),
        # user 4: simultaneous view+click -> strict > blocks stage 2
        ev(4, "view", 0), ev(4, "click", 0),
        # user 5: click arrives after the conversion window
        ev(5, "view", 0), ev(5, "click", 120),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    st = {
        r["user_id"]: r["stage"]
        for r in funnel_stages(
            df, ["view", "click", "purchase"], max_gap_seconds=3600
        ).collect()
    }
    assert st == {1: 3, 2: 2, 3: 0, 4: 1, 5: 1}


def test_funnel_validation(spark):
    import pytest as _pytest

    from deeptime_spark.operators.stats import funnel_stages

    df = spark.createDataFrame([], "user_id long, event_type string, ts timestamp")
    with _pytest.raises(ValueError):
        funnel_stages(df, [])


def test_retention_cohorts_semantics(spark):
    import datetime as dt

    from deeptime_spark.operators.stats import retention_cohorts

    def ev(uid, day):
        return (uid, "view", dt.datetime(2026, 1, day, 12, 0))

    rows = [
        ev(1, 1), ev(1, 2), ev(1, 8),    # cohort d1: active at offsets 0,1,7
        ev(2, 1), ev(2, 3),              # cohort d1: offsets 0,2(ignored)
        ev(3, 2), ev(3, 3),              # cohort d2: offsets 0,1
        ev(1, 1),                        # same-day duplicate: no double count
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(df, offsets=[0, 1, 7]).collect()
    }
    assert got == {
        ("2026-01-01", 0): 2,
        ("2026-01-01", 1): 1,
        ("2026-01-01", 7): 1,
        ("2026-01-02", 0): 1,
        ("2026-01-02", 1): 1,
    }


# ---------------------------------------------------------------- CUSUM


def _brute_cusum(vals, drift=0):
    c = sum(vals) // len(vals) if sum(vals) >= 0 else None
    import math

    c = math.floor(sum(vals) / len(vals))
    sp = sn = 0
    out = []
    for v in vals:
        sp = max(0, sp + (v - c) - drift)
        sn = max(0, sn + -(v - c) - drift)
        out.append((sp, sn))
    return out


def test_cusum_matches_recursion(spark, rng):
    from deeptime_spark.operators.stats import cusum_changepoints

    vals = [int(v) for v in rng.integers(-50, 50, 200)]
    # plant a level shift
    vals = vals + [int(v) + 40 for v in rng.integers(-50, 50, 100)]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, v long")
    got = {
        r["i"]: (r["cusum_pos"], r["cusum_neg"])
        for r in cusum_changepoints(
            df, "v", order_cols=("i",), threshold=200,
            allow_single_partition=True,
        ).collect()
    }
    exp = _brute_cusum(vals)
    for i, e in enumerate(exp):
        assert got[i] == e, (i, got[i], e)
    # the planted +40 shift must fire the POSITIVE side only after the
    # shift point (the pre-shift segment sits below the global mean, so
    # the negative side may fire earlier — that is correct CUSUM)
    pos_alarms = [
        r["i"]
        for r in cusum_changepoints(
            df, "v", order_cols=("i",), threshold=500,
            allow_single_partition=True,
        )
        .where("cusum_pos > 500")
        .collect()
    ]
    assert pos_alarms and min(pos_alarms) >= 200


def test_cusum_grouped_and_drift(spark):
    from deeptime_spark.operators.stats import cusum_changepoints

    rows = [("a", i, v) for i, v in enumerate([0, 0, 10, 10, 10])] + [
        ("b", i, v) for i, v in enumerate([5, 5, 5, 5, 5])
    ]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    got = {
        (r["g"], r["i"]): (r["cusum_pos"], r["cusum_neg"])
        for r in cusum_changepoints(
            df, "v", order_cols=("i",), group_cols=("g",), drift=1
        ).collect()
    }

    def rec(vals, drift):
        import math

        c = math.floor(sum(vals) / len(vals))
        sp = sn = 0
        res = []
        for v in vals:
            sp = max(0, sp + (v - c) - drift)
            sn = max(0, sn + -(v - c) - drift)
            res.append((sp, sn))
        return res

    for g, vals in (("a", [0, 0, 10, 10, 10]), ("b", [5, 5, 5, 5, 5])):
        for i, e in enumerate(rec(vals, 1)):
            assert got[(g, i)] == e


def test_cusum_requires_groups_or_explicit_single_partition(spark):
    import pytest

    from deeptime_spark.operators.stats import cusum_changepoints

    df = spark.createDataFrame([(0, 1), (1, 2)], "i long, v long")
    with pytest.raises(ValueError, match="ONE task"):
        cusum_changepoints(df, "v", order_cols=("i",))
